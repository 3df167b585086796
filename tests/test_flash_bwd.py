"""Pallas flash-attention backward kernels vs XLA gradients (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.ops.attention import xla_attention
from stable_diffusion_pytorch_tpu.ops.flash_attention import flash_attention
from stable_diffusion_pytorch_tpu.ops.flash_attention_bwd import (
    flash_attention_bwd,
    flash_attention_bwd_fused,
)

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("impl", ["split", "fused"])
@pytest.mark.parametrize(
    "n,m,h,d",
    [
        (64, 64, 2, 32),    # self-attn
        (128, 77, 2, 40),   # cross-attn, unaligned d + kv
        (100, 100, 1, 64),  # unaligned q/kv len
    ],
)
def test_bwd_kernels_match_xla_grads(n, m, h, d, impl):
    ks = jax.random.split(KEY, 4)
    q = jax.random.normal(ks[0], (2, n, h, d))
    k = jax.random.normal(ks[1], (2, m, h, d))
    v = jax.random.normal(ks[2], (2, m, h, d))
    do = jax.random.normal(ks[3], (2, n, h, d))
    scale = 1.0 / np.sqrt(d)

    if impl == "split":
        dq, dk, dv = flash_attention_bwd(
            q, k, v, do, scale, interpret=True, block_n=32
        )
    else:
        dq, dk, dv = flash_attention_bwd_fused(
            q, k, v, do, scale, interpret=True, block_n=32
        )

    def loss(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) * do)

    eq, ek, ev = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(eq), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(ek), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(ev), rtol=2e-4, atol=2e-4)


def test_end_to_end_custom_vjp_uses_pallas_bwd(monkeypatch):
    monkeypatch.setenv("SD_FLASH_BWD", "pallas")
    ks = jax.random.split(KEY, 3)
    q = jax.random.normal(ks[0], (1, 64, 2, 32))
    k = jax.random.normal(ks[1], (1, 77, 2, 32))
    v = jax.random.normal(ks[2], (1, 77, 2, 32))
    scale = 1.0 / np.sqrt(32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "n,m,h,d",
    [
        (64, 64, 2, 32),
        (128, 77, 2, 40),
    ],
)
def test_fused_bwd_bf16_temps_close_to_xla_grads(n, m, h, d):
    """bf16 softmax-numerator variant (SD_FLASH_BWD_BF16=1): p carries bf16
    rounding (~4e-3 relative), so tolerances widen accordingly — the point is
    no structural error, not bitwise parity with the f32-temps kernel."""
    ks = jax.random.split(KEY, 4)
    q = jax.random.normal(ks[0], (2, n, h, d))
    k = jax.random.normal(ks[1], (2, m, h, d))
    v = jax.random.normal(ks[2], (2, m, h, d))
    do = jax.random.normal(ks[3], (2, n, h, d))
    scale = 1.0 / np.sqrt(d)

    dq, dk, dv = flash_attention_bwd_fused(
        q, k, v, do, scale, interpret=True, block_n=32, bf16_temps=True
    )

    def loss(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) * do)

    eq, ek, ev = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for got, want in ((dq, eq), (dk, ek), (dv, ev)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )


@pytest.mark.parametrize(
    "n,m,h,d",
    [
        (384, 384, 2, 40),   # multi kv-chunk self-attn (3 chunks of 128)
        (128, 300, 1, 64),   # kv mask inside the last chunk
        (100, 256, 2, 32),   # padded q rows (100 -> 128)
    ],
)
def test_streaming_bwd_matches_xla_grads(n, m, h, d):
    """kv-blocked streaming backward (stats + dq + dkv) vs XLA einsum grads."""
    from stable_diffusion_pytorch_tpu.ops.flash_attention_bwd import (
        flash_attention_bwd_streaming,
    )

    ks = jax.random.split(KEY, 4)
    q = jax.random.normal(ks[0], (2, n, h, d))
    k = jax.random.normal(ks[1], (2, m, h, d))
    v = jax.random.normal(ks[2], (2, m, h, d))
    do = jax.random.normal(ks[3], (2, n, h, d))
    scale = 1.0 / np.sqrt(d)

    dq, dk, dv = flash_attention_bwd_streaming(
        q, k, v, do, scale, interpret=True, block_n=64, block_m=128
    )

    def loss(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) * do)

    eq, ek, ev = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for got, want in ((dq, eq), (dk, ek), (dv, ev)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )


def test_streaming_bwd_selected_beyond_resident_max(monkeypatch):
    """Gradients THROUGH flash_attention at streaming sizes route to the
    kv-blocked backward (no resident-KV kernel, no NotImplementedError)."""
    monkeypatch.setenv("SD_FLASH_KV_RESIDENT_MAX", "64")
    monkeypatch.setenv("SD_FLASH_BLOCK_M", "128")
    monkeypatch.setenv("SD_FLASH_SBWD_BLOCK_N", "64")
    monkeypatch.setenv("SD_FLASH_SBWD_BLOCK_M", "128")
    ks = jax.random.split(KEY, 4)
    q = jax.random.normal(ks[0], (1, 256, 2, 32))
    k = jax.random.normal(ks[1], (1, 256, 2, 32))
    v = jax.random.normal(ks[2], (1, 256, 2, 32))
    do = jax.random.normal(ks[3], (1, 256, 2, 32))
    scale = 1.0 / np.sqrt(32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, interpret=True) * do)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) * do)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4
        )
