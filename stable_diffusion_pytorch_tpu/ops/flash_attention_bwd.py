"""Pallas backward kernels for flash attention.

Replaces the XLA-recompute VJP (which materializes the full [B,H,N,M] score
tensor in HBM during training) with two VMEM-resident kernels:

- dq kernel: grid (B*H, N/BLOCK_N); per q-tile recompute p = softmax(qK^T),
  dp = do V^T, ds = p*(dp - rowsum(dp*p)), dq = scale * ds K.
- dkv kernel: grid (B*H,); loop over q-tiles accumulating dv += p^T do and
  dk += scale * ds^T q into VMEM scratch.

Same shape contract and padding/masking rules as the forward kernel
(ops/flash_attention.py). Exactness: all softmax/derivative algebra in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stable_diffusion_pytorch_tpu.ops.flash_attention import LANE, _round_up


def _recompute_p_ds(q, k, v, do, scale, kv_len):
    """Shared per-tile algebra: returns (p, ds) in f32. q/do: [Tn, D]; k/v: [M, D]."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m_pad = k.shape[0]
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [Tn, M]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tn, M]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    return p, ds


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, *, scale, kv_len):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    _, ds = _recompute_p_ds(q, k, v, do, scale, kv_len)
    dq = jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
    scale, kv_len,
):
    """Grid (B*H, N_tiles): q/do arrive one tile per grid step; dk/dv accumulate
    in f32 VMEM scratch, which persists across the (sequential) inner grid dim,
    and are written out on the last step. Keeps VMEM independent of N."""
    i = pl.program_id(1)
    num_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    p, ds = _recompute_p_ds(q, k, v, do, scale, kv_len)
    # dv += p^T do ; dk += scale * ds^T q
    dv_acc[...] += jax.lax.dot_general(
        p.astype(v.dtype), do.astype(v.dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_acc[...] += scale * jax.lax.dot_general(
        ds.astype(q.dtype), q,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == num_tiles - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


_LOG2E = 1.4426950408889634


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
    scale, kv_len, bf16_temps=False,
):
    """One pass computes dq AND accumulates dk/dv: the score recompute
    (s matmul, softmax, dp matmul) happens once per q-tile instead of once per
    kernel (5 big matmuls total vs 7 for the split dq + dkv pair).

    VPU savings mirror the forward kernel: q arrives pre-scaled by
    scale*log2(e) so the softmax is a bare exp2, and the 1/l normalization is
    folded into the small [Tn, D] operands (do/l, q/l) and the dq rows instead
    of touching [Tn, M] score tiles.

    ``bf16_temps`` stores the [Tn, M] softmax numerator in bf16 after the f32
    row-sum (normalization stays exact; p carries <=0.4%% relative rounding,
    on par with the bf16 matmul inputs everywhere else in the model). This
    drops one live f32 score tile from VMEM, buying a larger q-block — the
    lever the f32 version lacks (block 128 overflows the 16MB scope).
    """
    i = pl.program_id(1)
    num_tiles = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]  # pre-scaled by scale * log2(e)
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_pad = k.shape[0]
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - mx)  # [Tn, M] f32; p = e / l
    linv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # [Tn, 1] (f32-exact sum)
    if bf16_temps:
        e = e.astype(jnp.bfloat16)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tn, M]
    dpp = jnp.sum(dp * e, axis=-1, keepdims=True) * linv  # rowsum(dp * p)
    t = e * (dp - dpp)  # = ds * l  (the 1/l is folded into the small operands)

    t16 = t.astype(k.dtype)
    dq = jax.lax.dot_general(
        t16, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * linv)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    do_over_l = (do.astype(jnp.float32) * linv).astype(v.dtype)
    q_over_l = (q.astype(jnp.float32) * linv).astype(q.dtype)
    # dv += p^T do = e^T (do / l)
    dv_acc[...] += jax.lax.dot_general(
        e.astype(v.dtype), do_over_l,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dk += scale * ds^T q_orig = t^T (q_scaled / l) / log2(e)
    dk_acc[...] += jax.lax.dot_general(
        t16, q_over_l, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == num_tiles - 1)
    def _():
        dk_ref[0] = (dk_acc[...] * (1.0 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def flash_attention_bwd_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    do: jnp.ndarray,
    scale: float,
    interpret: bool,
    block_n: int = 96,
    bf16_temps: bool = False,
):
    """Fused single-pass backward: (dq, dk, dv) in the [B, L, H, D] layout."""
    b, n, h, d = q.shape
    m = k.shape[1]
    dtype = q.dtype

    d_pad = _round_up(d, LANE)
    m_pad = _round_up(m, LANE)
    block_n = min(block_n, _round_up(n, 16))
    n_pad = _round_up(n, block_n)

    def to_bhnd(x, length, length_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, d)
        return jnp.pad(x, ((0, 0), (0, length_pad - length), (0, d_pad - d)))

    qb = to_bhnd(q, n, n_pad) * jnp.asarray(scale * _LOG2E, dtype)
    kb = to_bhnd(k, m, m_pad)
    vb = to_bhnd(v, m, m_pad)
    dob = to_bhnd(do, n, n_pad)

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, scale=scale, kv_len=m, bf16_temps=bf16_temps
        ),
        grid=(b * h, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, block_n, d_pad), lambda bh, i: (bh, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), dtype),
            jax.ShapeDtypeStruct((b * h, m_pad, d_pad), dtype),
            jax.ShapeDtypeStruct((b * h, m_pad, d_pad), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad, d_pad), jnp.float32),
            pltpu.VMEM((m_pad, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb, dob)

    def from_bhnd(x, length):
        x = x[:, :length, :d].reshape(b, h, length, d)
        return jnp.transpose(x, (0, 2, 1, 3))

    return from_bhnd(dq, n), from_bhnd(dk, m), from_bhnd(dv, m)


def flash_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    do: jnp.ndarray,
    scale: float,
    interpret: bool,
    block_n: int = 64,
    dq_block_n: int = 0,
):
    """Returns (dq, dk, dv) with the [B, L, H, D] layout of the forward.

    ``block_n`` tiles the dkv kernel; ``dq_block_n`` (defaults to block_n) tiles
    the dq kernel, which has no scratch accumulators and can afford larger tiles.
    Both q paddings use the lcm so one padded layout serves both kernels.
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    dtype = q.dtype

    d_pad = _round_up(d, LANE)
    m_pad = _round_up(m, LANE)
    dq_block_n = dq_block_n or block_n
    block_n = min(block_n, _round_up(n, 16))
    dq_block_n = min(dq_block_n, _round_up(n, 16))
    n_pad = _round_up(n, max(block_n, dq_block_n))
    # both block sizes must divide n_pad
    while n_pad % block_n or n_pad % dq_block_n:
        n_pad += max(block_n, dq_block_n)

    def to_bhnd(x, length, length_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, d)
        return jnp.pad(x, ((0, 0), (0, length_pad - length), (0, d_pad - d)))

    qb = to_bhnd(q, n, n_pad)
    kb = to_bhnd(k, m, m_pad)
    vb = to_bhnd(v, m, m_pad)
    dob = to_bhnd(do, n, n_pad)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=m),
        grid=(b * h, n_pad // dq_block_n),
        in_specs=[
            pl.BlockSpec((1, dq_block_n, d_pad), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, dq_block_n, d_pad), lambda bh, i: (bh, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, dq_block_n, d_pad), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), dtype),
        interpret=interpret,
    )(qb, kb, vb, dob)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, kv_len=m),
        grid=(b * h, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, block_n, d_pad), lambda bh, i: (bh, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, m_pad, d_pad), dtype),
            jax.ShapeDtypeStruct((b * h, m_pad, d_pad), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad, d_pad), jnp.float32),
            pltpu.VMEM((m_pad, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb, dob)

    def from_bhnd(x, length):
        x = x[:, :length, :d].reshape(b, h, length, d)
        return jnp.transpose(x, (0, 2, 1, 3))

    return from_bhnd(dq, n), from_bhnd(dk, m), from_bhnd(dv, m)
