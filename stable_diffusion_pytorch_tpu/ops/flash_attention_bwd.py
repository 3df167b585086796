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
    """Shared per-tile algebra: returns (p, ds) in f32. q/do: [Tn, D]; k/v: [M, D].

    dp = do V^T is issued (program order) BEFORE the softmax: it depends only
    on do/v, so the asynchronous MXU computes it while the VPU runs the
    [Tn, M] max/exp/normalize passes (the round-5 serialization finding —
    in-order dispatch otherwise stalls the second matmul behind the VPU)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tn, M]
    m_pad = k.shape[0]
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [Tn, M]
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

    # MXU/VPU overlap (round-5 serialization finding): dp = do V^T depends
    # only on do/v, so it is issued straight after s — the MXU drains it
    # while the VPU runs the [Tn, M] softmax; the dv accumulate (needs only
    # e/linv) is likewise issued BEFORE the big dpp/t VPU passes so it
    # overlaps them.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tn, M]
    m_pad = k.shape[0]
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - mx)  # [Tn, M] f32; p = e / l
    linv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # [Tn, 1] (f32-exact sum)
    if bf16_temps:
        e = e.astype(jnp.bfloat16)

    do_over_l = (do.astype(jnp.float32) * linv).astype(v.dtype)
    q_over_l = (q.astype(jnp.float32) * linv).astype(q.dtype)
    # dv += p^T do = e^T (do / l)
    dv_acc[...] += jax.lax.dot_general(
        e.astype(v.dtype), do_over_l,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dpp = jnp.sum(dp * e, axis=-1, keepdims=True) * linv  # rowsum(dp * p)
    t = e * (dp - dpp)  # = ds * l  (the 1/l is folded into the small operands)

    t16 = t.astype(k.dtype)
    dq = jax.lax.dot_general(
        t16, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * linv)
    dq_ref[0] = dq.astype(dq_ref.dtype)

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


# ---------------------------------------------------------------------------
# Streaming (kv-blocked) backward: for kv lengths beyond the resident-KV
# kernels' VMEM reach (>_KV_RESIDENT_MAX padded tokens, e.g. 1024px latents'
# 16384-token self-attention — the forward already streams there). Three
# kernels, none of which ever holds full K/V:
#
#   stats: per q-tile, ONE streaming pass over kv chunks computes the row
#          log-sum-exp (lse) and delta = rowsum(p * dp) via the same online
#          rescaling recurrence as the forward (running max m, normalizer l,
#          rescaled dot-sum).
#   dq:    per q-tile, kv chunks innermost; p = exp2(s - lse) is already
#          normalized, dq accumulates in VMEM scratch.
#   dkv:   per kv-chunk, q-tiles innermost; dk/dv accumulate in scratch
#          (the _dkv_kernel pattern, one extra grid dim).
#
# Padded q rows need no masking: their do rows are zero-padded, so dp, delta
# and every accumulated contribution vanish; p stays bounded (<= 1) because
# lse is recomputed from the identical s values. Padded kv columns are
# -inf-masked exactly as in the forward.
# ---------------------------------------------------------------------------


def _sbwd_stats_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, m_scr, l_scr, d_scr,
    *, kv_len, block_m, m_blocks, use_exp2,
):
    j = pl.program_id(2)
    q = q_ref[0]  # [BN, Dp], pre-scaled (incl. log2e when use_exp2)
    k = k_ref[0]  # [BM, Dp]
    v = v_ref[0]
    do = do_ref[0]

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        d_scr[...] = jnp.zeros_like(d_scr)

    # dp issued right after s (independent of it): MXU drains it while the
    # VPU runs the online-softmax recurrence (round-5 serialization finding)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_len < block_m * m_blocks:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_m
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))

    m_prev = m_scr[...][:, 0:1]
    l_prev = l_scr[...][:, 0:1]
    d_prev = d_scr[...][:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    if use_exp2:
        alpha = jnp.exp2(m_prev - m_new)
        e = jnp.exp2(s - m_new)
    else:
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(e, axis=-1, keepdims=True)
    d_new = alpha * d_prev + jnp.sum(e * dp, axis=-1, keepdims=True)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
    d_scr[...] = jnp.broadcast_to(d_new, d_scr.shape)

    @pl.when(j == m_blocks - 1)
    def _():
        log = jnp.log2 if use_exp2 else jnp.log
        lse_ref[0] = m_scr[...] + log(l_scr[...])
        delta_ref[0] = d_scr[...] / l_scr[...]


def _sbwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, kv_len, block_m, m_blocks, use_exp2, scale,
):
    j = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    @pl.when(j == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    # dp issued right after s (independent): overlaps the VPU exp pass
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_len < block_m * m_blocks:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_m
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
    lse = lse_ref[0][:, 0:1]
    p = jnp.exp2(s - lse) if use_exp2 else jnp.exp(s - lse)  # normalized
    t = p * (dp - delta_ref[0][:, 0:1])
    dq_scr[...] += jax.lax.dot_general(
        t.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == m_blocks - 1)
    def _():
        dq_ref[0] = (dq_scr[...] * scale).astype(dq_ref.dtype)


def _sbwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, kv_len, block_m, m_blocks, use_exp2, scale,
):
    jq = pl.program_id(2)
    n_tiles = pl.num_programs(2)
    jm = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    @pl.when(jq == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    # dp issued right after s (independent): the VPU exp pass overlaps it,
    # and the dv accumulate (MXU) overlaps the t algebra (VPU) below
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BN, BM]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_len < block_m * m_blocks:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jm * block_m
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
    lse = lse_ref[0][:, 0:1]
    p = jnp.exp2(s - lse) if use_exp2 else jnp.exp(s - lse)
    dv_scr[...] += jax.lax.dot_general(
        p.astype(v.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t = p * (dp - delta_ref[0][:, 0:1])
    dk_scr[...] += jax.lax.dot_general(
        t.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jq == n_tiles - 1)
    def _():
        # q arrives pre-scaled; ds^T q_raw = t^T q_scaled / (scale * log2e),
        # then dk = scale * (ds^T q_raw) — the scales cancel to 1/log2e
        inv = (1.0 / _LOG2E) if use_exp2 else 1.0
        dk_ref[0] = (dk_scr[...] * inv).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def flash_attention_bwd_streaming(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    do: jnp.ndarray,
    scale: float,
    interpret: bool,
    block_n: int = 256,
    block_m: int = 1024,
):
    """kv-blocked streaming backward: (dq, dk, dv), [B, L, H, D] layout."""
    import os

    b, n, h, d = q.shape
    m = k.shape[1]
    dtype = q.dtype
    use_exp2 = os.environ.get("SD_FLASH_EXP2", "1") == "1"

    d_pad = _round_up(d, LANE)
    block_m = min(block_m, _round_up(m, LANE))
    m_pad = _round_up(m, block_m)
    block_n = min(block_n, _round_up(n, 16))
    n_pad = _round_up(n, block_n)
    m_blocks = m_pad // block_m

    def to_bhnd(x, length, length_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, d)
        return jnp.pad(x, ((0, 0), (0, length_pad - length), (0, d_pad - d)))

    q_scale = scale * _LOG2E if use_exp2 else scale
    qb = to_bhnd(q, n, n_pad) * jnp.asarray(q_scale, dtype)
    kb = to_bhnd(k, m, m_pad)
    vb = to_bhnd(v, m, m_pad)
    dob = to_bhnd(do, n, n_pad)

    q_spec = pl.BlockSpec((1, block_n, d_pad), lambda bh, i, j: (bh, i, 0))
    kv_spec = pl.BlockSpec((1, block_m, d_pad), lambda bh, i, j: (bh, j, 0))
    row_spec = pl.BlockSpec((1, block_n, LANE), lambda bh, i, j: (bh, i, 0))
    common = dict(kv_len=m, block_m=block_m, m_blocks=m_blocks,
                  use_exp2=use_exp2)

    lse, delta = pl.pallas_call(
        functools.partial(_sbwd_stats_kernel, **common),
        grid=(b * h, n_pad // block_n, m_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((b * h, n_pad, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, LANE), jnp.float32),
            pltpu.VMEM((block_n, LANE), jnp.float32),
            pltpu.VMEM((block_n, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb, dob)

    dq = pl.pallas_call(
        functools.partial(_sbwd_dq_kernel, scale=scale, **common),
        grid=(b * h, n_pad // block_n, m_blocks),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), dtype),
        scratch_shapes=[pltpu.VMEM((block_n, d_pad), jnp.float32)],
        interpret=interpret,
    )(qb, kb, vb, dob, lse, delta)

    # dkv: kv chunk outer, q tiles inner (scratch resets per kv chunk)
    q_spec_i = pl.BlockSpec((1, block_n, d_pad), lambda bh, jm, i: (bh, i, 0))
    kv_spec_o = pl.BlockSpec((1, block_m, d_pad), lambda bh, jm, i: (bh, jm, 0))
    row_spec_i = pl.BlockSpec((1, block_n, LANE), lambda bh, jm, i: (bh, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_sbwd_dkv_kernel, scale=scale, **common),
        grid=(b * h, m_blocks, n_pad // block_n),
        in_specs=[q_spec_i, kv_spec_o, kv_spec_o, q_spec_i, row_spec_i,
                  row_spec_i],
        out_specs=[kv_spec_o, kv_spec_o],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, m_pad, d_pad), dtype),
            jax.ShapeDtypeStruct((b * h, m_pad, d_pad), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, d_pad), jnp.float32),
            pltpu.VMEM((block_m, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb, dob, lse, delta)

    def from_bhnd(x, length):
        x = x[:, :length, :d].reshape(b, h, length, d)
        return jnp.transpose(x, (0, 2, 1, 3))

    return from_bhnd(dq, n), from_bhnd(dk, m), from_bhnd(dv, m)
