"""GroupNorm (+ optional fused SiLU) over channel-last tensors.

The GN->SiLU->Conv prologue appears in every ResBlock and output head of the
reference (/root/reference/stable_diffusion/modules/resnet2d.py:171-199,
models/utils.py:193-200). Centralizing it here lets the XLA implementation be
swapped for a Pallas kernel without touching model code. Statistics are computed
in float32 for bf16 safety (torch GroupNorm also accumulates in fp32).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = "auto"  # "auto" | "xla" | "pallas"


def set_groupnorm_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown groupnorm impl {impl!r}")
    _IMPL = impl


def _use_pallas() -> bool:
    if _IMPL == "xla":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    return _IMPL == "pallas" or on_tpu


def xla_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = False,
) -> jnp.ndarray:
    """x: [..., C] channel-last. Matches torch.nn.GroupNorm (eps 1e-5) + SiLU."""
    dtype = x.dtype
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    orig_shape = x.shape
    xf = x.astype(jnp.float32).reshape(orig_shape[0], -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(orig_shape)
    xf = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        xf = xf * jax.nn.sigmoid(xf)
    return xf.astype(dtype)


def _pallas_eligible(x: jnp.ndarray) -> bool:
    import numpy as np

    c = x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    from stable_diffusion_pytorch_tpu.ops.fused_groupnorm import _VMEM_BYTES_LIMIT

    return (
        c % 128 == 0
        and s % 8 == 0
        and s * c * x.dtype.itemsize <= _VMEM_BYTES_LIMIT
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_group_norm(x, scale, bias, num_groups, eps, apply_silu):
    from stable_diffusion_pytorch_tpu.ops.fused_groupnorm import pallas_group_norm

    return pallas_group_norm(x, scale, bias, num_groups, eps, apply_silu)


def _fused_fwd(x, scale, bias, num_groups, eps, apply_silu):
    out = _fused_group_norm(x, scale, bias, num_groups, eps, apply_silu)
    return out, (x, scale, bias)


def _fused_bwd(num_groups, eps, apply_silu, res, g):
    # exact gradients by differentiating the XLA reference implementation
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: xla_group_norm(x_, s_, b_, num_groups, eps, apply_silu),
        x,
        scale,
        bias,
    )
    return vjp(g)


_fused_group_norm.defvjp(_fused_fwd, _fused_bwd)


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = False,
) -> jnp.ndarray:
    """Dispatching entry point. Fused Pallas kernel (with XLA-exact custom VJP)
    on TPU for VMEM-fitting feature maps; XLA elsewhere."""
    if _use_pallas():
        eligible = _pallas_eligible(x)
        if _IMPL == "pallas" and not eligible:
            raise ValueError("shape not eligible for the fused GN kernel")
        if eligible:
            return _fused_group_norm(x, scale, bias, num_groups, eps, apply_silu)
    return xla_group_norm(x, scale, bias, num_groups, eps, apply_silu)
