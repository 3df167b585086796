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
