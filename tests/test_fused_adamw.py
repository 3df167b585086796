"""Fused AdamW (trainers/fused_adamw.py) vs the optax chain it replaces.

The fused transform must match ``chain(clip_by_global_norm, adamw)`` to f32
round-off across steps, schedules, clipping regimes, and mu dtypes, and the
fused accumulation wrapper must match ``optax.MultiSteps`` — it is the default
optimizer (trainers/optim.py), so parity here is what protects training
semantics (reference: /root/reference/train_unet.py:208-236).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stable_diffusion_pytorch_tpu.trainers.fused_adamw import (
    fused_accumulate,
    fused_adamw,
)


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    return {
        "conv": {
            "kernel": jax.random.normal(ks[0], (3, 3, 8, 16)) * 0.1,
            "bias": jax.random.normal(ks[1], (16,)) * 0.01,
        },
        "dense": jax.random.normal(ks[2], (32, 7)),
        "scale": jax.random.normal(ks[3], ()),
    }


def _grads_seq(n, seed=100):
    return [
        jax.tree_util.tree_map(
            lambda p, i=i: jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(seed), i * 31 + hash(p.shape) % 97),
                p.shape,
            )
            * (0.5 if i % 3 else 30.0),  # every 3rd step trips the clip
            _tree(),
        )
        for i in range(n)
    ]


def _assert_trees_close(a, b, rtol=2e-6, atol=2e-6):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), rtol=rtol, atol=atol
        ),
        a,
        b,
    )


@pytest.mark.parametrize("max_norm", [0.1, 1e6])
@pytest.mark.parametrize("schedule", ["const", "warmup"])
def test_matches_optax_chain_over_steps(max_norm, schedule):
    lr = (
        1e-3
        if schedule == "const"
        else optax.join_schedules(
            [optax.linear_schedule(0.0, 1e-3, 3), optax.constant_schedule(1e-3)], [3]
        )
    )
    wd = 0.01
    ref_tx = optax.chain(
        optax.clip_by_global_norm(max_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd),
    )
    fx = fused_adamw(
        lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd, max_grad_norm=max_norm
    )

    p_ref = _tree()
    p_fused = jax.tree_util.tree_map(jnp.copy, p_ref)
    s_ref = ref_tx.init(p_ref)
    s_fused = fx.init(p_fused)

    for g in _grads_seq(6):
        upd, s_ref = ref_tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_fused, s_fused = fx.apply(g, s_fused, p_fused)
        _assert_trees_close(p_ref, p_fused)

    # moments match too (state layout: count, mu, nu)
    adam_state = s_ref[1][0]
    _assert_trees_close(adam_state.mu, s_fused.mu)
    _assert_trees_close(adam_state.nu, s_fused.nu)
    assert int(adam_state.count) == int(s_fused.count) == 6


def test_update_api_matches_apply_api():
    fx = fused_adamw(1e-3, weight_decay=0.01, max_grad_norm=1.0)
    p = _tree()
    s = fx.init(p)
    g = _grads_seq(1)[0]
    upd, s_u = fx.update(g, s, p)
    p_u = optax.apply_updates(p, upd)
    p_a, s_a = fx.apply(g, s, p)
    _assert_trees_close(p_u, p_a, rtol=1e-5, atol=1e-6)
    _assert_trees_close(s_u.mu, s_a.mu)


def test_mu_dtype_bf16_storage():
    fx = fused_adamw(1e-3, mu_dtype="bfloat16")
    p = _tree()
    s = fx.init(p)
    assert all(
        m.dtype == jnp.bfloat16 for m in jax.tree_util.tree_leaves(s.mu)
    )
    g = _grads_seq(1)[0]
    _, s2 = fx.apply(g, s, p)
    assert all(
        m.dtype == jnp.bfloat16 for m in jax.tree_util.tree_leaves(s2.mu)
    )
    assert all(n.dtype == jnp.float32 for n in jax.tree_util.tree_leaves(s2.nu))


def test_no_clip_skips_norm_but_matches_adamw():
    fx = fused_adamw(1e-2, weight_decay=0.0, max_grad_norm=None)
    ref_tx = optax.adamw(1e-2, weight_decay=0.0)
    p_ref = _tree(3)
    p_fused = jax.tree_util.tree_map(jnp.copy, p_ref)
    s_ref, s_fused = ref_tx.init(p_ref), fx.init(p_fused)
    for g in _grads_seq(3, seed=7):
        upd, s_ref = ref_tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_fused, s_fused = fx.apply(g, s_fused, p_fused)
    _assert_trees_close(p_ref, p_fused)


@pytest.mark.parametrize("k", [2, 4])
def test_accumulate_matches_multisteps(k):
    """7 micro steps at every_k=k: same params trajectory as optax.MultiSteps,
    including the partial tail (no sync on the last incomplete window)."""
    lr, wd, mn = 1e-3, 0.01, 0.5
    ref_tx = optax.MultiSteps(
        optax.chain(
            optax.clip_by_global_norm(mn), optax.adamw(lr, weight_decay=wd)
        ),
        every_k_schedule=k,
    )
    fx = fused_accumulate(
        fused_adamw(lr, weight_decay=wd, max_grad_norm=mn), every_k=k
    )

    p_ref = _tree(5)
    p_fused = jax.tree_util.tree_map(jnp.copy, p_ref)
    s_ref, s_fused = ref_tx.init(p_ref), fx.init(p_fused)

    for i, g in enumerate(_grads_seq(7, seed=42)):
        upd, s_ref = ref_tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_fused, s_fused = fx.apply(g, s_fused, p_fused)
        _assert_trees_close(p_ref, p_fused, rtol=5e-6, atol=5e-6)
        # params must be bit-unchanged on non-sync micro steps
        if (i + 1) % k != 0:
            assert int(s_fused.mini_step) == (i + 1) % k

    assert int(s_fused.inner.count) == 7 // k


def test_accumulate_under_jit():
    """The trainer path shape: jitted apply, params unchanged on micro steps."""
    k = 3
    fx = fused_accumulate(fused_adamw(1e-3, max_grad_norm=1.0), every_k=k)
    p = _tree(9)
    s = fx.init(p)

    @jax.jit
    def step(p, s, g):
        return fx.apply(g, s, p)

    p0 = jax.tree_util.tree_map(np.asarray, p)
    for i, g in enumerate(_grads_seq(3, seed=11)):
        p, s = step(p, s, g)
        if i < k - 1:
            _assert_trees_close(p, p0, rtol=0, atol=0)
    # after the k-th micro step the update landed
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p0))
    )
    assert moved


def test_accumulate_bf16_accumulator():
    """--accum-dtype bf16: accumulator stored bf16 (the SD-1.5 memory lever),
    trajectory stays close to the f32 accumulator (store-rounding only)."""
    k = 4
    fx32 = fused_accumulate(fused_adamw(1e-3, max_grad_norm=1.0), every_k=k)
    fx16 = fused_accumulate(
        fused_adamw(1e-3, max_grad_norm=1.0), every_k=k, acc_dtype=jnp.bfloat16
    )
    p32 = _tree(2)
    p16 = jax.tree_util.tree_map(jnp.copy, p32)
    s32, s16 = fx32.init(p32), fx16.init(p16)
    assert all(
        a.dtype == jnp.bfloat16 for a in jax.tree_util.tree_leaves(s16.acc)
    )
    for g in _grads_seq(2 * k, seed=21):
        p32, s32 = fx32.apply(g, s32, p32)
        p16, s16 = fx16.apply(g, s16, p16)
    assert all(
        a.dtype == jnp.bfloat16 for a in jax.tree_util.tree_leaves(s16.acc)
    )
    # 2 sync updates with lr 1e-3: params moved ~2e-3; bf16 accumulation
    # rounds at ~0.4% relative, so the param delta agrees to ~1e-5
    _assert_trees_close(p32, p16, rtol=2e-4, atol=5e-5)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0, p32, _tree(2)
    )
    assert any(jax.tree_util.tree_leaves(moved))


def test_build_optimizer_accum_dtype_wiring():
    from types import SimpleNamespace

    from stable_diffusion_pytorch_tpu.trainers.optim import build_optimizer

    cfg = SimpleNamespace(
        learning_rate=1e-4,
        adam_weight_decay=0.1,
        max_grad_norm=0.1,
        scheduler_type="constant",
        lr_warmup_steps=0,
        use_8bit_adam=False,
        adam_mu_dtype="f32",
        no_fused_adamw=False,
        accum_dtype="bf16",
    )
    tx = build_optimizer(cfg, 100, gradient_accumulation_steps=4)
    s = tx.init({"w": jnp.ones((4, 4), jnp.float32)})
    assert s.acc["w"].dtype == jnp.bfloat16


def test_build_optimizer_selects_fused_by_default():
    from types import SimpleNamespace

    from stable_diffusion_pytorch_tpu.trainers.fused_adamw import (
        FusedAccumTransformation,
        FusedTransformation,
    )
    from stable_diffusion_pytorch_tpu.trainers.optim import build_optimizer

    cfg = SimpleNamespace(
        learning_rate=1e-4,
        adam_weight_decay=0.1,
        max_grad_norm=0.1,
        scheduler_type="constant",
        lr_warmup_steps=0,
        use_8bit_adam=False,
        adam_mu_dtype="f32",
        no_fused_adamw=False,
    )
    assert isinstance(build_optimizer(cfg, 100), FusedTransformation)
    assert isinstance(
        build_optimizer(cfg, 100, gradient_accumulation_steps=4),
        FusedAccumTransformation,
    )
    cfg.no_fused_adamw = True
    tx = build_optimizer(cfg, 100)
    assert not hasattr(tx, "apply")


def test_nu_dtype_bf16_storage_and_closeness():
    """bf16 second moment (--adam-nu-dtype bf16): state dtype honored, and the
    parameter trajectory stays within the documented ~2^-10 relative window of
    the f32-nu trajectory over several steps."""
    fx16 = fused_adamw(1e-3, weight_decay=0.01, max_grad_norm=1.0, nu_dtype="bfloat16")
    fx32 = fused_adamw(1e-3, weight_decay=0.01, max_grad_norm=1.0)
    p16 = _tree(5)
    p32 = jax.tree_util.tree_map(jnp.copy, p16)
    s16, s32 = fx16.init(p16), fx32.init(p32)
    assert all(n.dtype == jnp.bfloat16 for n in jax.tree_util.tree_leaves(s16.nu))
    for g in _grads_seq(6, seed=11):
        p16, s16 = fx16.apply(g, s16, p16)
        p32, s32 = fx32.apply(g, s32, p32)
    assert all(n.dtype == jnp.bfloat16 for n in jax.tree_util.tree_leaves(s16.nu))
    # update magnitude is ~lr per step; 6 steps of <=0.2% relative update
    # error keeps the trees within ~1e-4 absolute at lr 1e-3
    _assert_trees_close(p16, p32, rtol=5e-3, atol=5e-4)


def test_build_optimizer_nu_dtype_wiring_and_guard():
    from types import SimpleNamespace

    import pytest as _pytest

    from stable_diffusion_pytorch_tpu.trainers.optim import build_optimizer

    base = dict(
        learning_rate=1e-4,
        adam_weight_decay=0.1,
        max_grad_norm=0.1,
        scheduler_type="constant",
        lr_warmup_steps=0,
        use_8bit_adam=False,
        adam_mu_dtype="f32",
        no_fused_adamw=False,
    )
    tx = build_optimizer(SimpleNamespace(**base, adam_nu_dtype="bf16"), 100)
    s = tx.init({"w": jnp.ones((4, 4), jnp.float32)})
    assert s.nu["w"].dtype == jnp.bfloat16
    with _pytest.raises(ValueError, match="fused AdamW"):
        build_optimizer(
            SimpleNamespace(
                **{**base, "no_fused_adamw": True}, adam_nu_dtype="bf16"
            ),
            100,
        )


def test_8bit_adam_composes_with_fused_accumulate():
    """--use-8bit-adam + gradient accumulation must NOT route through
    optax.MultiSteps (f32 accumulator + params-wide zero-update stream every
    micro step — measured to OOM SD-1.5-scale HBM, docs/PERFORMANCE.md).
    build_optimizer composes it via as_fused_apply + fused_accumulate, which
    must match MultiSteps' mean-of-micro-grads semantics."""
    from types import SimpleNamespace

    from stable_diffusion_pytorch_tpu.trainers.fused_adamw import (
        FusedAccumTransformation,
    )
    from stable_diffusion_pytorch_tpu.trainers.optim import build_optimizer

    cfg = SimpleNamespace(
        learning_rate=1e-3,
        adam_weight_decay=0.1,
        max_grad_norm=1.0,
        scheduler_type="constant",
        lr_warmup_steps=0,
        use_8bit_adam=True,
        adam_mu_dtype="f32",
        adam_nu_dtype="f32",
        no_fused_adamw=False,
        accum_dtype="bf16",
    )
    tx = build_optimizer(cfg, 100, gradient_accumulation_steps=2)
    assert isinstance(tx, FusedAccumTransformation)
    p = _tree(9)
    s = tx.init(p)
    assert s.acc["dense"].dtype == jnp.bfloat16  # --accum-dtype honored

    # semantics vs MultiSteps around the same 8-bit inner chain
    from stable_diffusion_pytorch_tpu.trainers.adam8bit import adamw_8bit

    inner = optax.chain(
        optax.clip_by_global_norm(1.0), adamw_8bit(1e-3, weight_decay=0.1)
    )
    ms = optax.MultiSteps(inner, every_k_schedule=2)
    cfg_f32 = SimpleNamespace(**{**cfg.__dict__, "accum_dtype": "f32"})
    fx = build_optimizer(cfg_f32, 100, gradient_accumulation_steps=2)
    p_ms = _tree(9)
    p_fx = jax.tree_util.tree_map(jnp.copy, p_ms)
    s_ms, s_fx = ms.init(p_ms), fx.init(p_fx)
    for g in _grads_seq(4, seed=21):
        upd, s_ms = ms.update(g, s_ms, p_ms)
        p_ms = optax.apply_updates(p_ms, upd)
        p_fx, s_fx = fx.apply(g, s_fx, p_fx)
    _assert_trees_close(p_ms, p_fx, rtol=1e-5, atol=1e-6)
