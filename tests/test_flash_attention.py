"""Flash-attention kernel tests (Pallas interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.ops.attention import xla_attention
from stable_diffusion_pytorch_tpu.ops.flash_attention import flash_attention

KEY = jax.random.PRNGKey(0)


def rand(shape, key=KEY, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize(
    "n,m,h,d",
    [
        (64, 64, 4, 32),     # tiny self-attn
        (256, 256, 2, 40),   # SD d_head=40, unaligned D
        (100, 77, 2, 64),    # cross-attn: unaligned q len + text kv 77
        (64, 7, 1, 128),     # short kv, single head
    ],
)
def test_flash_matches_xla(n, m, h, d):
    ks = jax.random.split(KEY, 3)
    q = rand((2, n, h, d), ks[0])
    k = rand((2, m, h, d), ks[1])
    v = rand((2, m, h, d), ks[2])
    scale = 1.0 / np.sqrt(d)
    ours = flash_attention(q, k, v, scale, interpret=True)
    ref = xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_bf16():
    ks = jax.random.split(KEY, 3)
    q = rand((1, 128, 2, 40), ks[0], jnp.bfloat16)
    k = rand((1, 77, 2, 40), ks[1], jnp.bfloat16)
    v = rand((1, 77, 2, 40), ks[2], jnp.bfloat16)
    ours = flash_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v, 1.0 / np.sqrt(40))
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_flash_gradients_match_xla():
    ks = jax.random.split(KEY, 3)
    q = rand((1, 64, 2, 32), ks[0])
    k = rand((1, 77, 2, 32), ks[1])
    v = rand((1, 77, 2, 32), ks[2])
    scale = 1.0 / np.sqrt(32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_dispatch_uses_flash_when_forced():
    from stable_diffusion_pytorch_tpu.ops import attention as A

    ks = jax.random.split(KEY, 3)
    q = rand((1, 64, 2, 32), ks[0])
    k = rand((1, 77, 2, 32), ks[1])
    v = rand((1, 77, 2, 32), ks[2])
    A.set_attention_impl("pallas")
    try:
        out = A.multi_head_attention(q, k, v)
    finally:
        A.set_attention_impl("auto")
    ref = A.xla_attention(q, k, v, 1.0 / np.sqrt(32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_auto_fallback_warns_once_and_counts(monkeypatch, caplog):
    """Auto-mode Pallas failure must degrade loudly: one warning per process,
    a fallback counter bench.py can assert on, and a correct XLA result."""
    import logging

    from stable_diffusion_pytorch_tpu.ops import attention as A
    from stable_diffusion_pytorch_tpu.ops import flash_attention as FA

    def broken(*a, **k):
        raise RuntimeError("deliberately broken kernel")

    monkeypatch.setattr(FA, "flash_attention", broken)
    monkeypatch.setattr(A, "_use_pallas", lambda q: True)
    A.reset_attention_stats()

    ks = jax.random.split(KEY, 3)
    q = rand((1, 64, 2, 32), ks[0])
    k = rand((1, 77, 2, 32), ks[1])
    v = rand((1, 77, 2, 32), ks[2])

    with caplog.at_level(logging.WARNING, logger=A.logger.name):
        out = A.multi_head_attention(q, k, v)
        out2 = A.multi_head_attention(q, k, v)

    ref = A.xla_attention(q, k, v, 1.0 / np.sqrt(32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=2e-5, atol=2e-5)
    warnings = [r for r in caplog.records if "falling back" in r.getMessage()]
    assert len(warnings) == 1, "fallback warning must fire exactly once per process"
    stats = A.attention_stats()
    assert stats["fallback"] == 2 and stats["xla"] == 2 and stats["flash"] == 0
    A.reset_attention_stats()


def test_forced_pallas_reraises(monkeypatch):
    from stable_diffusion_pytorch_tpu.ops import attention as A
    from stable_diffusion_pytorch_tpu.ops import flash_attention as FA

    def broken(*a, **k):
        raise RuntimeError("deliberately broken kernel")

    monkeypatch.setattr(FA, "flash_attention", broken)
    A.set_attention_impl("pallas")
    try:
        with pytest.raises(RuntimeError, match="deliberately broken"):
            A.multi_head_attention(
                rand((1, 8, 1, 8)), rand((1, 8, 1, 8)), rand((1, 8, 1, 8))
            )
    finally:
        A.set_attention_impl("auto")


def test_tuned_block_table_chooser(monkeypatch):
    """The baked autotune table drives the q-block choice by token count:
    largest measured bucket <= n wins; the smallest bucket covers below."""
    from stable_diffusion_pytorch_tpu.ops import flash_attention as fa

    monkeypatch.setattr(
        fa, "_TUNED_BLOCK_N", {1024: 256, 4096: 512, 9216: 384}
    )
    assert fa._tuned_block_n(4096) == 512
    assert fa._tuned_block_n(9216) == 384
    assert fa._tuned_block_n(16384) == 384  # above all buckets: largest key
    assert fa._tuned_block_n(2000) == 256   # between buckets: floor bucket
    assert fa._tuned_block_n(64) == 256     # below all buckets: smallest
    monkeypatch.setattr(fa, "_TUNED_BLOCK_N", {})
    assert fa._tuned_block_n(4096) is None  # unbaked: fall to DEFAULT_BLOCK_N


def test_bake_autotune_roundtrip(tmp_path, monkeypatch):
    """bake_autotune parses hw-session autotune records and rewrites the
    marked table block; the rewritten module still parses and carries the
    measured entries."""
    import importlib.util
    import json
    import shutil

    spec = importlib.util.spec_from_file_location(
        "bake_autotune", "tools/bake_autotune.py"
    )
    bake = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bake)

    session = tmp_path / "hw.jsonl"
    recs = [
        {"phase": "headline", "ok": True, "result": {"value": 1.1}},
        {
            "phase": "autotune_sample", "ok": True, "env": {},
            "result": {"results": [
                {"point": 256, "value": 1.05},
                {"point": 512, "value": 1.14},
            ]},
        },
        {
            "phase": "autotune_256", "ok": True, "env": {"BENCH_RES": "256"},
            "result": {"results": [
                {"point": 256, "value": 9.0},
                {"point": 512, "value": 8.1},
                {"point": 1024, "error": "oom"},
            ]},
        },
        {"phase": "autotune_768", "ok": False, "error": "tunnel_down"},
    ]
    session.write_text("\n".join(json.dumps(r) for r in recs) + "\n")

    table = bake.collect(str(session))
    assert table == {4096: (512, 1.14, 512), 1024: (256, 9.0, 256)}

    target = tmp_path / "flash_attention.py"
    shutil.copy(bake.KERNEL, target)
    monkeypatch.setattr(bake, "KERNEL", str(target))
    monkeypatch.setattr(
        "sys.argv", ["bake_autotune.py", str(session)]
    )
    bake.main()
    src = target.read_text()
    assert "1024: 256," in src and "4096: 512," in src
    compile(src, str(target), "exec")  # rewritten module still valid python


@pytest.mark.parametrize(
    "n,m,h,d",
    [
        (384, 384, 2, 40),   # multi kv-block self-attn (3 chunks of 128)
        (256, 300, 1, 64),   # kv padding mask inside the last chunk
        (100, 77, 2, 64),    # cross-attn: single partial kv chunk
    ],
)
def test_streaming_kv_blocked_matches_xla(n, m, h, d, monkeypatch):
    """The online-softmax kv-blocked kernel (1024px path: kv too large for
    resident K/V) must match XLA attention like the resident kernel does."""
    monkeypatch.setenv("SD_FLASH_KV_RESIDENT_MAX", "64")  # force streaming
    monkeypatch.setenv("SD_FLASH_BLOCK_M", "128")
    ks = jax.random.split(KEY, 3)
    q = rand((2, n, h, d), ks[0])
    k = rand((2, m, h, d), ks[1])
    v = rand((2, m, h, d), ks[2])
    scale = 1.0 / np.sqrt(d)
    ours = flash_attention(q, k, v, scale, interpret=True)
    ref = xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_streaming_matches_resident_bf16(monkeypatch):
    """Streaming and resident kernels agree on bf16 inputs (the hardware
    dtype) within bf16 tolerance."""
    ks = jax.random.split(KEY, 3)
    q = rand((1, 256, 2, 40), ks[0], jnp.bfloat16)
    k = rand((1, 256, 2, 40), ks[1], jnp.bfloat16)
    v = rand((1, 256, 2, 40), ks[2], jnp.bfloat16)
    resident = flash_attention(q, k, v, 0.125, interpret=True)
    monkeypatch.setenv("SD_FLASH_KV_RESIDENT_MAX", "64")
    monkeypatch.setenv("SD_FLASH_BLOCK_M", "128")
    streaming = flash_attention(q, k, v, 0.125, interpret=True)
    np.testing.assert_allclose(
        np.asarray(streaming, np.float32), np.asarray(resident, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize(
    "n,m,h,d,u",
    [
        (384, 512, 2, 40, 2),   # 4 chunks of 128 -> 2 grid steps of 2
        (256, 512, 1, 64, 4),   # all chunks in ONE grid step (m_blocks=1)
        (256, 300, 1, 64, 2),   # kv padding inside the pipelined chunks
        (128, 77, 2, 64, 4),    # u clamped: fewer chunks than requested
    ],
)
def test_streaming_interleaved_matches_xla(n, m, h, d, u, monkeypatch):
    """SD_FLASH_INTERLEAVE software-pipelines kv chunks (next score matmul
    issued before the current softmax); the recurrence must stay exact."""
    monkeypatch.setenv("SD_FLASH_KV_RESIDENT_MAX", "64")  # force streaming
    monkeypatch.setenv("SD_FLASH_BLOCK_M", "128")
    monkeypatch.setenv("SD_FLASH_INTERLEAVE", str(u))
    ks = jax.random.split(KEY, 3)
    q = rand((2, n, h, d), ks[0])
    k = rand((2, m, h, d), ks[1])
    v = rand((2, m, h, d), ks[2])
    scale = 1.0 / np.sqrt(d)
    ours = flash_attention(q, k, v, scale, interpret=True)
    ref = xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
