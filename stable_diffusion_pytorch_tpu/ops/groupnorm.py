"""GroupNorm (+ optional fused SiLU) over channel-last tensors.

The GN->SiLU->Conv prologue appears in every ResBlock and output head of the
reference (/root/reference/stable_diffusion/modules/resnet2d.py:171-199,
models/utils.py:193-200). Centralizing it here lets the XLA implementation be
swapped for a Pallas kernel without touching model code. Statistics are computed
in float32 for bf16 safety (torch GroupNorm also accumulates in fp32).
"""

from __future__ import annotations

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


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = False,
) -> jnp.ndarray:
    """Dispatching entry point. Pallas kernel used on TPU when available."""
    if _use_pallas():
        try:
            from stable_diffusion_pytorch_tpu.ops.fused_groupnorm import (
                pallas_group_norm,
            )

            return pallas_group_norm(x, scale, bias, num_groups, eps, apply_silu)
        except Exception:
            if _IMPL == "pallas":
                raise
    return xla_group_norm(x, scale, bias, num_groups, eps, apply_silu)
