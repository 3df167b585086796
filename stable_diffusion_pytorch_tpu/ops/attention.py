"""Attention dispatch: XLA einsum path now, Pallas flash kernel behind the same API.

The reference materializes the full (h*w x seq) score matrix inside
``CrossAttention.forward`` (/root/reference/stable_diffusion/modules/transformer.py:100-111).
On TPU the hot path is a blockwise online-softmax flash kernel (O(n) memory over the
h*w axis); everything routes through :func:`multi_head_attention` so the kernel can be
swapped per-platform without touching model code.

Layout: inputs are [batch, q_len, n_heads, d_head] / [batch, kv_len, n_heads, d_head];
output is [batch, q_len, n_heads, d_head]. Softmax is computed in float32 regardless
of the compute dtype (bf16-safe), matching torch's float32 softmax under autocast.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = "auto"  # "auto" | "xla" | "pallas"
_TP_MESH = None  # (mesh, data_axis, model_axis) when tensor parallelism is on


def set_attention_impl(impl: str) -> None:
    """Select the attention implementation globally ("auto", "xla", "pallas")."""
    global _IMPL
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown attention impl {impl!r}")
    _IMPL = impl


def set_tp_mesh(mesh, data_axis: str = "data", model_axis: str = "model") -> None:
    """Register the 2-D (data, model) mesh for tensor-parallel attention.

    Pallas kernels are opaque to GSPMD, so under TP the flash kernel runs
    inside shard_map: the batch splits over ``data`` and the HEADS split over
    ``model`` (attention is embarrassingly parallel across heads — the
    TPU-native analog of Megatron splitting attention by head). Pass ``None``
    to clear.
    """
    global _TP_MESH
    _TP_MESH = None if mesh is None else (mesh, data_axis, model_axis)


def get_attention_impl() -> str:
    return _IMPL


def _use_pallas(q: jnp.ndarray) -> bool:
    if _IMPL == "xla":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    if _IMPL == "pallas":
        return True
    return on_tpu


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference XLA path: einsum QK^T -> f32 softmax -> einsum @V.

    Semantics match transformer.py:100-111 (including the f32 softmax).
    """
    dtype = q.dtype
    # [B, H, N, M]
    sim = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    sim = sim * scale
    if mask is not None:
        sim = jnp.where(mask, jnp.finfo(jnp.float32).min, sim)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", attn.astype(dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatching entry point used by all model attention layers.

    q: [B, N, H, D], k/v: [B, M, H, D] -> [B, N, H, D].
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    if mask is None and _use_pallas(q):
        try:
            from stable_diffusion_pytorch_tpu.ops.flash_attention import (
                flash_attention,
            )

            if _TP_MESH is not None:
                mesh, data_axis, model_axis = _TP_MESH
                n_model = mesh.shape[model_axis]
                n_data = mesh.shape[data_axis]
                if q.shape[2] % n_model == 0 and q.shape[0] % n_data == 0:
                    from jax.experimental.shard_map import shard_map
                    from jax.sharding import PartitionSpec as P

                    spec = P(data_axis, None, model_axis, None)
                    return shard_map(
                        lambda qq, kk, vv: flash_attention(qq, kk, vv, scale),
                        mesh=mesh,
                        in_specs=(spec, spec, spec),
                        out_specs=spec,
                        check_rep=False,
                    )(q, k, v)
            return flash_attention(q, k, v, scale)
        except Exception:
            if _IMPL == "pallas":
                raise
            # auto mode: fall back silently (e.g. shape not supported yet)
            pass
    return xla_attention(q, k, v, scale, mask)
