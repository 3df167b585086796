"""Fused GroupNorm kernel tests (Pallas interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.ops import groupnorm as G
from stable_diffusion_pytorch_tpu.ops.fused_groupnorm import pallas_group_norm

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize(
    "shape,groups",
    [
        ((2, 8, 8, 128), 32),
        ((1, 16, 16, 256), 32),
        ((3, 64, 128), 4),       # token layout [B, N, C]
        ((2, 8, 8, 1280), 32),   # SD bottleneck channels
    ],
)
def test_pallas_gn_matches_xla(shape, groups):
    x = jax.random.normal(KEY, shape)
    c = shape[-1]
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    for silu in (False, True):
        ours = pallas_group_norm(x, scale, bias, groups, apply_silu=silu)
        ref = G.xla_group_norm(x, scale, bias, groups, apply_silu=silu)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_pallas_gn_bf16():
    x = jax.random.normal(KEY, (2, 8, 8, 128), jnp.bfloat16)
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    ours = pallas_group_norm(x, scale, bias, 32, apply_silu=True)
    ref = G.xla_group_norm(x, scale, bias, 32, apply_silu=True)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_fused_gn_gradients_match_xla():
    G.set_groupnorm_impl("pallas")
    try:
        x = jax.random.normal(KEY, (2, 8, 8, 128))
        scale = jnp.ones((128,)) * 1.3
        bias = jnp.ones((128,)) * 0.1

        def loss_fused(x, s, b):
            return jnp.sum(G.group_norm(x, s, b, 32, apply_silu=True) ** 2)

        def loss_xla(x, s, b):
            return jnp.sum(G.xla_group_norm(x, s, b, 32, apply_silu=True) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, bias)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
    finally:
        G.set_groupnorm_impl("auto")


def test_dispatch_falls_back_for_unaligned_channels():
    """C=320 is not lane-aligned: dispatch must use XLA silently in auto mode."""
    x = jax.random.normal(KEY, (2, 8, 8, 320))
    scale, bias = jnp.ones((320,)), jnp.zeros((320,))
    out = G.group_norm(x, scale, bias, 32)  # auto mode, must not raise
    ref = G.xla_group_norm(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("silu", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_gn_bwd_kernel_matches_vjp(silu, dtype):
    """Direct check of the fused backward kernel (dx, dscale, dbias) against
    autodiff of the XLA forward."""
    from stable_diffusion_pytorch_tpu.ops.fused_groupnorm import (
        pallas_group_norm_bwd,
    )

    x = jax.random.normal(KEY, (3, 8, 8, 128)).astype(dtype)
    g = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 8, 8, 128)).astype(dtype)
    scale = (jnp.ones((128,)) * 1.3).astype(dtype)
    bias = (jnp.ones((128,)) * 0.1).astype(dtype)

    dx, dscale, dbias = pallas_group_norm_bwd(
        x, g, scale, bias, 32, apply_silu=silu
    )
    _, vjp = jax.vjp(
        lambda x_, s_, b_: G.xla_group_norm(x_, s_, b_, 32, apply_silu=silu),
        x, scale, bias,
    )
    rx, rs, rb = vjp(g)
    tol = 1e-4 if dtype == jnp.float32 else 6e-2
    np.testing.assert_allclose(
        np.asarray(dx, np.float32), np.asarray(rx, np.float32), rtol=tol, atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(dscale, np.float32), np.asarray(rs, np.float32),
        rtol=tol, atol=tol,
    )
    np.testing.assert_allclose(
        np.asarray(dbias, np.float32), np.asarray(rb, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_bwd_falls_back_for_large_maps(monkeypatch):
    """Maps over half the VMEM budget take the XLA-vjp branch and stay exact."""
    import stable_diffusion_pytorch_tpu.ops.fused_groupnorm as FG

    G.set_groupnorm_impl("pallas")
    monkeypatch.setattr(FG, "_VMEM_BYTES_LIMIT", 64 * 128 * 4 * 2)  # fwd ok, bwd not
    try:
        x = jax.random.normal(KEY, (2, 8, 8, 128))
        scale, bias = jnp.ones((128,)), jnp.zeros((128,))

        def loss(x_, s_, b_):
            return jnp.sum(G.group_norm(x_, s_, b_, 32, apply_silu=True) ** 2)

        gf = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
        gx = jax.grad(
            lambda x_, s_, b_: jnp.sum(
                G.xla_group_norm(x_, s_, b_, 32, apply_silu=True) ** 2
            ),
            argnums=(0, 1, 2),
        )(x, scale, bias)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )
    finally:
        G.set_groupnorm_impl("auto")


# ----------------------- concat-input GroupNorm ----------------------- #


@pytest.mark.parametrize(
    "c1,c2,groups",
    [
        (128, 128, 32),   # aligned, groups split cleanly at the boundary
        (6, 10, 4),       # group straddles the part boundary (size 4: ch 4..7)
        (10, 6, 8),       # straddle, uneven parts
        (256, 128, 32),   # aligned, unequal parts
    ],
)
def test_group_norm_cat_matches_concat(c1, c2, groups):
    """group_norm_cat(x, s) must equal group_norm(concat(x, s)) exactly —
    including when a group straddles the part boundary."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, c1)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 4, 4, c2)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c1 + c2), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c1 + c2), jnp.float32)

    ref = G.xla_group_norm(
        jnp.concatenate([x, s], -1), scale, bias, groups, apply_silu=True
    )
    out = G.xla_group_norm_cat(x, s, scale, bias, groups, apply_silu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_pallas_group_norm_cat_matches_xla():
    from stable_diffusion_pytorch_tpu.ops.fused_groupnorm import (
        pallas_group_norm_cat,
    )

    rng = np.random.default_rng(1)
    c1, c2, groups = 128, 256, 32
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c1)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 8, 8, c2)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c1 + c2), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c1 + c2), jnp.float32)
    ref = G.xla_group_norm_cat(x, s, scale, bias, groups, apply_silu=True)
    out = pallas_group_norm_cat(x, s, scale, bias, groups, apply_silu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_group_norm_cat_gradients_match_concat():
    """Autodiff through the split formulation == autodiff through concat+GN,
    for x, s, scale and bias (and through the fused custom-VJP wrapper)."""
    rng = np.random.default_rng(2)
    c1, c2, groups = 128, 128, 16
    x = jnp.asarray(rng.standard_normal((1, 4, 4, c1)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((1, 4, 4, c2)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c1 + c2), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c1 + c2), jnp.float32)

    def loss_cat(x, s, scale, bias):
        y = G.group_norm_cat(x, s, scale, bias, groups, apply_silu=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, s, scale, bias):
        y = G.xla_group_norm(
            jnp.concatenate([x, s], -1), scale, bias, groups, apply_silu=True
        )
        return jnp.sum(jnp.sin(y))

    g_cat = jax.grad(loss_cat, argnums=(0, 1, 2, 3))(x, s, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, s, scale, bias)
    for a, b in zip(g_cat, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
