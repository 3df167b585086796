"""Fused int8-Adam moment update Pallas kernel.

The XLA lowering of the 8-bit optimizer's leaf update (trainers/adam8bit.py)
costs ~56 ms/step at SD-1.5 scale over f32 Adam (365 vs 309 ms, measured
round 4 on hardware even after the layout-preserving relayout fix): the
blockwise-absmax REDUCTION between the moment update and the requantize
forces XLA to materialize both f32 moment tensors to HBM (update pass ->
reduce pass -> requantize pass). That is +16 bytes/param of pure traffic on
a phase whose f32 baseline already runs at ~73% of the HBM roofline.

This kernel performs dequantize -> Adam moment update -> blockwise absmax ->
requantize in ONE VMEM-resident pass per tile. The f32 moments never exist
in HBM; per-parameter traffic drops from ~32 B (XLA int8 path) to ~12 B
(read g[4] + codes[2] + write codes[2] + update[4] + scales), which should
land the int8 optimizer BELOW the f32 AdamW phase's ~28 B/param — making
``use_8bit_adam`` (reference: bitsandbytes AdamW8bit,
/root/reference/train_unet.py:210-218) a memory lever AND a speed lever,
true to bitsandbytes' CUDA intent.

Layout contract (matches trainers/adam8bit.py round-4 storage exactly):
codes are int8 in the parameter's own shape; absmax blocks tile the minor
(lane) dimension — [.., C] splits into 256-wide lane blocks when 256 | C,
else one block per row. The kernel sees a 2-D [rows, C] view (a free
row-major collapse of the leading axes) and loops the <=10 lane sub-blocks
with static 128-aligned slices, so Mosaic never relayouts anything.

Quantization math is bit-identical to the XLA path (same op order):
    q  = round(127 * sign(x) * sqrt(|x| / absmax_block)), clip to [-127,127]
    x~ = sign(q) * (q/127)^2 * absmax_block
with nu additionally stored in the sqrt domain (see trainers/adam8bit.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Per-tile VMEM working set: g(4) + upd(4) + 4x int8 codes(4) + ~6 f32
# temporaries (dequantized moments, squares, code intermediates) ~= 36 B per
# element. 8 MB keeps the worst case well inside the 16 MB scoped limit.
_VMEM_BYTES_BUDGET = 8 * 1024 * 1024
_BYTES_PER_ELEM = 36

# Leaves below this size stay on the XLA path: the per-call overhead of a
# Pallas custom call outweighs the traffic saved, and hundreds of tiny-leaf
# kernels would bloat the (remote, 3-8 min) compile.
MIN_PALLAS_ELEMS = 1 << 16

# dispatch counters (test/diagnostic introspection, ops/attention.py pattern)
_counters = {"pallas": 0, "xla": 0}


def _mode() -> str:
    return os.environ.get("SD_ADAM8BIT_KERNEL", "auto")


def use_pallas_for(shape, numel: int, sharded: bool = False) -> bool:
    """Gate: Pallas for large >=2-D leaves unless SD_ADAM8BIT_KERNEL=xla.

    ``sharded=True`` means the caller runs the kernel per-shard inside a
    ``shard_map`` whose specs match the ZeRO placement (trainers/adam8bit.py)
    — ``shape``/``numel`` are then the LOCAL shard's, and the size gate
    applies to the per-device work. Without it, auto mode requires a
    single-device process: under pjit with ZeRO/FSDP-sharded moments a bare
    Pallas custom call cannot be auto-partitioned by SPMD (it would force a
    gather of the very state the sharding is meant to split).
    ``SD_ADAM8BIT_KERNEL=pallas`` overrides the size gates for layouts the
    caller knows are safe.
    """
    mode = _mode()
    if mode == "xla":
        return False
    if len(shape) < 2:
        return False
    if mode == "pallas":
        return True
    return numel >= MIN_PALLAS_ELEMS and (sharded or jax.device_count() == 1)


def _row_tile(rows: int, c: int) -> int:
    """Largest row tile that divides ``rows``, is int8-sublane (32) aligned,
    and fits the VMEM budget; 0 means single whole-array block."""
    if rows * c * _BYTES_PER_ELEM <= _VMEM_BYTES_BUDGET:
        return 0
    cap = _VMEM_BYTES_BUDGET // (_BYTES_PER_ELEM * c)
    rt = (cap // 32) * 32
    while rt >= 32:
        if rows % rt == 0:
            return rt
        rt -= 32
    return -1  # no aligned divisor: caller falls back to XLA


def _kernel(
    g_ref, muq_ref, mus_ref, nuq_ref, nus_ref, bc_ref,
    upd_ref, nmuq_ref, nmus_ref, nnuq_ref, nnus_ref,
    *, b1, b2, eps, block, nb,
):
    g = g_ref[...].astype(jnp.float32)  # [Rt, C]
    bc1 = bc_ref[0, 0]
    bc2 = bc_ref[0, 1]

    def deq(q, scale):
        qf = q.astype(jnp.float32) * (1.0 / 127.0)
        return jnp.sign(qf) * qf * qf * scale

    def quant(x):
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # [Rt, 1]
        safe = jnp.where(absmax > 0, absmax, jnp.float32(1.0))
        y = x / safe
        q = jnp.clip(
            jnp.round(127.0 * jnp.sign(y) * jnp.sqrt(jnp.abs(y))), -127, 127
        )
        return q.astype(jnp.int8), absmax

    for j in range(nb):  # static lane sub-block loop (<=10 iterations)
        sl = slice(j * block, (j + 1) * block)
        gj = g[:, sl]
        mu = b1 * deq(muq_ref[:, sl], mus_ref[:, j : j + 1]) + (1.0 - b1) * gj
        nu_sqrt = deq(nuq_ref[:, sl], nus_ref[:, j : j + 1])
        nu = b2 * (nu_sqrt * nu_sqrt) + (1.0 - b2) * gj * gj
        upd_ref[:, sl] = ((mu / bc1) / (jnp.sqrt(nu / bc2) + eps)).astype(
            upd_ref.dtype
        )
        qm, sm = quant(mu)
        nmuq_ref[:, sl] = qm
        nmus_ref[:, j : j + 1] = sm
        qn, sn = quant(jnp.sqrt(nu))
        nnuq_ref[:, sl] = qn
        nnus_ref[:, j : j + 1] = sn


def fused_adam8bit_update(
    g: jnp.ndarray,
    mu_q: jnp.ndarray,
    mu_scale: jnp.ndarray,
    nu_q: jnp.ndarray,
    nu_scale: jnp.ndarray,
    bc1: jnp.ndarray,
    bc2: jnp.ndarray,
    *,
    b1: float,
    b2: float,
    eps: float,
    block_size: int,
    interpret: bool | None = None,
):
    """One-pass int8 Adam leaf update.

    Returns ``(update, new_mu_q, new_mu_scale, new_nu_q, new_nu_scale)`` with
    codes in the parameter's shape and scales in the stored keepdims shape,
    numerically identical to the XLA path in trainers/adam8bit.py.
    Raises ValueError when no aligned row tiling exists (caller falls back).
    """
    shape = g.shape
    c = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    sub_blocked = c % block_size == 0 and c > block_size
    block = block_size if sub_blocked else c
    nb = c // block

    rt = _row_tile(rows, c)
    if rt == -1:
        raise ValueError(f"no aligned row tile for shape {shape}")
    grid_rows = 1 if rt == 0 else rows // rt
    rt = rows if rt == 0 else rt

    g2 = g.reshape(rows, c)
    muq2 = mu_q.reshape(rows, c)
    nuq2 = nu_q.reshape(rows, c)
    mus2 = mu_scale.reshape(rows, nb)
    nus2 = nu_scale.reshape(rows, nb)
    bc = jnp.stack([bc1.astype(jnp.float32), bc2.astype(jnp.float32)]).reshape(
        1, 2
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    row_spec = pl.BlockSpec((rt, c), lambda i: (i, 0))
    scale_spec = pl.BlockSpec((rt, nb), lambda i: (i, 0))
    upd, nmuq, nmus, nnuq, nnus = pl.pallas_call(
        functools.partial(
            _kernel, b1=b1, b2=b2, eps=eps, block=block, nb=nb
        ),
        grid=(grid_rows,),
        in_specs=[
            row_spec,  # g
            row_spec,  # mu codes
            scale_spec,  # mu scales
            row_spec,  # nu codes
            scale_spec,  # nu scales
            pl.BlockSpec((1, 2), lambda i: (0, 0)),  # bias corrections
        ],
        out_specs=[row_spec, row_spec, scale_spec, row_spec, scale_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), g.dtype),
            jax.ShapeDtypeStruct((rows, c), jnp.int8),
            jax.ShapeDtypeStruct((rows, nb), jnp.float32),
            jax.ShapeDtypeStruct((rows, c), jnp.int8),
            jax.ShapeDtypeStruct((rows, nb), jnp.float32),
        ],
        interpret=interpret,
    )(g2, muq2, mus2, nuq2, nus2, bc)
    _counters["pallas"] += 1

    scale_shape = mu_scale.shape
    return (
        upd.reshape(shape),
        nmuq.reshape(shape),
        nmus.reshape(scale_shape),
        nnuq.reshape(shape),
        nnus.reshape(scale_shape),
    )
