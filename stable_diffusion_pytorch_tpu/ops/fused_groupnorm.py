"""Fused GroupNorm(+SiLU) Pallas kernel.

One VMEM-resident pass per batch element: statistics, normalization, affine and
the SiLU activation fuse into a single kernel, vs. XLA's multi-pass lowering of
the GN->SiLU prologue that opens every ResBlock and output head
(/root/reference/stable_diffusion/modules/resnet2d.py:171-199).

Group reductions are computed WITHOUT reshaping the channel (lane) axis —
C/groups is rarely lane-aligned (e.g. 320/32 = 10). Instead a [C, G] 0/1
membership matrix turns per-group sums and the group->channel broadcast into
two tiny MXU matmuls:

    per-channel sums  [C]   = reduce_S(x), reduce_S(x^2)      (VPU)
    per-group sums    [G]   = sums @ membership               (MXU)
    per-channel stats [C]   = membership @ group_stats        (MXU)

Only used when one batch element's feature map fits VMEM (all SD-1.5 UNet maps
at 512x512 qualify); ops.groupnorm falls back to XLA otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-batch-element VMEM budget for x (bytes). The compiler's scoped working
# set is ~8x the bf16 input (f32 copies of x and y plus the output), so keep
# the input under ~1.8MB to stay inside the 16MB VMEM.
_VMEM_BYTES_LIMIT = int(1.8 * 1024 * 1024)

# The cat kernel holds MORE per input byte: the two f32 part-casts AND their
# f32 concatenation coexist (if Mosaic does not alias the casts into the
# concat) — ~10x the bf16 input vs the single-input kernel's ~8x. A separate,
# tighter budget keeps the worst case inside the 16MB scope; 1.5MB still
# admits the flagship 1280+1280 @ 16x16 up-path maps (1.31MB bf16 input).
_VMEM_CAT_BYTES_LIMIT = int(1.5 * 1024 * 1024)


def _gn_kernel(x_ref, scale_ref, bias_ref, memb_ref, o_ref, *, eps, silu, group_size):
    x = x_ref[0].astype(jnp.float32)  # [S, C]
    s = x.shape[0]
    n = s * group_size

    xs = jnp.sum(x, axis=0)        # [C]
    xsq = jnp.sum(x * x, axis=0)   # [C]
    memb = memb_ref[...]           # [C, G] f32

    gs = jnp.dot(xs[None, :], memb, preferred_element_type=jnp.float32)    # [1, G]
    gsq = jnp.dot(xsq[None, :], memb, preferred_element_type=jnp.float32)  # [1, G]
    mean_g = gs / n
    var_g = gsq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    # broadcast group stats back to channels: [1,G] @ [G,C]
    mean_c = jnp.dot(mean_g, memb.T, preferred_element_type=jnp.float32)  # [1, C]
    inv_c = jnp.dot(inv_g, memb.T, preferred_element_type=jnp.float32)    # [1, C]

    scale = scale_ref[...].astype(jnp.float32)
    bias = bias_ref[...].astype(jnp.float32)
    y = (x - mean_c) * inv_c * scale[None, :] + bias[None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_bwd_kernel(
    x_ref, g_ref, scale_ref, bias_ref, memb_ref,
    dx_ref, dscale_ref, dbias_ref, *, eps, silu, group_size,
):
    """Fused GN(+SiLU) backward for one batch element: recompute statistics
    from the saved input, then produce dx and per-element dscale/dbias partials
    in a single VMEM-resident pass (the standard GN backward identity
    dx = inv * (dxhat - (S1 + xhat*S2)/n) with group sums via the membership
    matmuls, matching the forward's layout trick)."""
    x = x_ref[0].astype(jnp.float32)  # [S, C]
    g = g_ref[0].astype(jnp.float32)  # [S, C]
    s = x.shape[0]
    n = s * group_size
    memb = memb_ref[...]  # [C, G]

    xs = jnp.sum(x, axis=0)
    xsq = jnp.sum(x * x, axis=0)
    gs = jnp.dot(xs[None, :], memb, preferred_element_type=jnp.float32)
    gsq = jnp.dot(xsq[None, :], memb, preferred_element_type=jnp.float32)
    mean_g = gs / n
    var_g = gsq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, memb.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, memb.T, preferred_element_type=jnp.float32)

    scale = scale_ref[...].astype(jnp.float32)
    xhat = (x - mean_c) * inv_c
    if silu:
        bias = bias_ref[...].astype(jnp.float32)
        y = xhat * scale[None, :] + bias[None, :]
        sig = jax.nn.sigmoid(y)
        g = g * (sig * (1.0 + y * (1.0 - sig)))

    # partials live in [8, C] blocks (row 0 carries the value) — the Mosaic
    # lowering requires sublane-multiple block shapes; the 7 zero rows cost
    # nothing against the [S, C] main output
    c = x.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, c), 0)
    dbias_ref[0] = jnp.where(row == 0, jnp.sum(g, axis=0)[None, :], 0.0)
    dscale_ref[0] = jnp.where(row == 0, jnp.sum(g * xhat, axis=0)[None, :], 0.0)

    dxhat = g * scale[None, :]
    s1_c = jnp.sum(dxhat, axis=0)          # [C]
    s2_c = jnp.sum(dxhat * xhat, axis=0)   # [C]
    s1_bc = jnp.dot(
        jnp.dot(s1_c[None, :], memb, preferred_element_type=jnp.float32),
        memb.T, preferred_element_type=jnp.float32,
    )
    s2_bc = jnp.dot(
        jnp.dot(s2_c[None, :], memb, preferred_element_type=jnp.float32),
        memb.T, preferred_element_type=jnp.float32,
    )
    dx = inv_c * (dxhat - (s1_bc + xhat * s2_bc) / n)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def pallas_group_norm_bwd(
    x: jnp.ndarray,
    g: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = False,
):
    """Backward companion of ``pallas_group_norm``: (dx, dscale, dbias).
    One grid step per batch element; dscale/dbias partials reduce outside."""
    orig_shape = x.shape
    b, c = orig_shape[0], orig_shape[-1]
    s = int(np.prod(orig_shape[1:-1]))
    assert c % num_groups == 0

    # x AND g both live in VMEM -> half the forward's input budget
    if s * c * x.dtype.itemsize > _VMEM_BYTES_LIMIT // 2:
        raise ValueError("feature map too large for the fused GN bwd kernel")
    if c % 128 != 0 or s % 8 != 0:
        raise ValueError("unaligned shape for the fused GN bwd kernel")

    group_size = c // num_groups
    memb = np.zeros((c, num_groups), np.float32)
    memb[np.arange(c), np.arange(c) // group_size] = 1.0
    memb = jnp.asarray(memb)

    xr = x.reshape(b, s, c)
    gr = g.reshape(b, s, c)
    dx, dscale_p, dbias_p = pl.pallas_call(
        functools.partial(
            _gn_bwd_kernel, eps=eps, silu=apply_silu, group_size=group_size
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), x.dtype),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xr, gr, scale.astype(jnp.float32), bias.astype(jnp.float32), memb)
    return (
        dx.reshape(orig_shape),
        jnp.sum(dscale_p, axis=(0, 1)).astype(scale.dtype),
        jnp.sum(dbias_p, axis=(0, 1)).astype(bias.dtype),
    )


def _gn_cat_kernel(
    x1_ref, x2_ref, scale_ref, bias_ref, memb_ref, o_ref, *, eps, silu, group_size
):
    """Concat-input variant: one VMEM-resident pass reads the two parts of the
    UNet up-path skip concatenation, computes JOINT group statistics, and
    writes the normalized(+SiLU) concat — the raw concat never touches HBM
    (reference analog: the materialized channel concat at
    /root/reference/stable_diffusion/models/unet.py:306-309)."""
    x = jnp.concatenate(
        [x1_ref[0].astype(jnp.float32), x2_ref[0].astype(jnp.float32)], axis=1
    )  # [S, C1+C2] — VMEM only
    s = x.shape[0]
    n = s * group_size

    xs = jnp.sum(x, axis=0)
    xsq = jnp.sum(x * x, axis=0)
    memb = memb_ref[...]

    gs = jnp.dot(xs[None, :], memb, preferred_element_type=jnp.float32)
    gsq = jnp.dot(xsq[None, :], memb, preferred_element_type=jnp.float32)
    mean_g = gs / n
    var_g = gsq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, memb.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, memb.T, preferred_element_type=jnp.float32)

    scale = scale_ref[...].astype(jnp.float32)
    bias = bias_ref[...].astype(jnp.float32)
    y = (x - mean_c) * inv_c * scale[None, :] + bias[None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def pallas_group_norm_cat(
    x: jnp.ndarray,
    x2: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = False,
) -> jnp.ndarray:
    """GroupNorm(+SiLU) of concat(x, x2) along channels -> [..., C1+C2]."""
    b, c1 = x.shape[0], x.shape[-1]
    c2 = x2.shape[-1]
    c = c1 + c2
    s = int(np.prod(x.shape[1:-1]))
    assert x.shape[:-1] == x2.shape[:-1], (x.shape, x2.shape)
    assert c % num_groups == 0

    if s * c * x.dtype.itemsize > _VMEM_CAT_BYTES_LIMIT:
        raise ValueError("feature map too large for the fused GN cat kernel")
    if c1 % 128 != 0 or c2 % 128 != 0 or s % 8 != 0:
        raise ValueError("unaligned shape for the fused GN cat kernel")

    group_size = c // num_groups
    memb = np.zeros((c, num_groups), np.float32)
    memb[np.arange(c), np.arange(c) // group_size] = 1.0
    memb = jnp.asarray(memb)

    out = pl.pallas_call(
        functools.partial(
            _gn_cat_kernel, eps=eps, silu=apply_silu, group_size=group_size
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, c2), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(
        x.reshape(b, s, c1),
        x2.reshape(b, s, c2),
        scale.astype(jnp.float32),
        bias.astype(jnp.float32),
        memb,
    )
    return out.reshape(x.shape[:-1] + (c,))


def pallas_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = False,
) -> jnp.ndarray:
    orig_shape = x.shape
    b, c = orig_shape[0], orig_shape[-1]
    s = int(np.prod(orig_shape[1:-1]))
    assert c % num_groups == 0

    if s * c * x.dtype.itemsize > _VMEM_BYTES_LIMIT:
        raise ValueError("feature map too large for the fused GN kernel")
    if c % 128 != 0 or s % 8 != 0:
        raise ValueError("unaligned shape for the fused GN kernel")

    group_size = c // num_groups
    memb = np.zeros((c, num_groups), np.float32)
    memb[np.arange(c), np.arange(c) // group_size] = 1.0
    memb = jnp.asarray(memb)

    xr = x.reshape(b, s, c)
    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, eps=eps, silu=apply_silu, group_size=group_size
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xr, scale.astype(jnp.float32), bias.astype(jnp.float32), memb)
    return out.reshape(orig_shape)
