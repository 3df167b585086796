"""Device mesh + sharding helpers (the NCCL/Accelerate replacement).

The reference delegates all distribution to HF Accelerate over NCCL
(/root/reference/train_unet.py:97-110, accelerate_config YAMLs). The TPU-native
equivalent is a mesh over ICI with XLA collectives inserted by the compiler
from sharding annotations:

- batch arrays: sharded on axis 0 over ``data`` (DDP analog)
- params: replicated (grad allreduce == XLA-inserted psum at the jit boundary)
- optimizer state: optionally sharded over ``data`` (DeepSpeed ZeRO-2 analog,
  train_unet.py:101-109) via :func:`zero_shardings`
- tensor parallelism (beyond the reference, which has none — SURVEY §2.3): a
  2-D ``(data, model)`` mesh with attention/FFN weights sharded over ``model``
  (:func:`tp_shardings`, Megatron-style column/row split); GSPMD propagates
  the activation shardings and inserts the psum after each row-parallel
  projection. The Pallas flash kernel runs heads-sharded under shard_map
  (ops/attention.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(
    num_devices: Optional[int] = None, devices=None, model_parallel: int = 1
) -> Mesh:
    """Data-parallel mesh over local devices; with ``model_parallel`` > 1, a
    2-D ``(data, model)`` mesh where adjacent devices (fastest ICI links) form
    the model groups."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    devices = np.asarray(devices)
    if model_parallel > 1:
        assert devices.size % model_parallel == 0, (
            f"{devices.size} devices not divisible by model_parallel={model_parallel}"
        )
        grid = devices.reshape(devices.size // model_parallel, model_parallel)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 across the data axis (per-device batch slices)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shardings(mesh: Mesh, batch) -> object:
    """Sharding tree for a batch pytree: axis 0 over data for every leaf."""
    return jax.tree_util.tree_map(lambda _: data_sharded(mesh), batch)


def largest_divisible_axis(shape, n: int):
    """The axis :func:`zero_shardings` shards over ``n`` devices: the largest
    NON-MINOR axis whose size divides ``n`` evenly, falling back to the minor
    axis, else ``None``.

    Preferring a leading axis over the (lane) minor axis costs nothing for
    ZeRO memory (any divisible axis gives the 1/n shard) and keeps the
    int8-Adam lane-dim quantization blocks (trainers/adam8bit.py) intact
    within each shard, so the fused Pallas update kernel can run per-shard
    under shard_map with specs that AGREE with this placement — spec
    agreement is what makes the shard_map free of resharding collectives.
    """
    best_axis, best_size = None, 0
    for axis, size in enumerate(shape[:-1]):
        if size > best_size and size % n == 0 and size > 0:
            best_axis, best_size = axis, size
    if best_axis is None and len(shape) >= 1:
        c = shape[-1]
        if c > 0 and c % n == 0:
            return len(shape) - 1
    return best_axis


def zero_shardings(mesh: Mesh, pytree) -> object:
    """ZeRO-style shardings for optimizer state: shard each leaf along its
    LARGEST evenly-divisible axis over the data axis, else replicate.

    This is the TPU analog of DeepSpeed ZeRO-2 optimizer-state partitioning
    (train_unet.py:101-109): each device holds 1/N of the Adam moments, and XLA
    inserts the reduce-scatter/all-gather pattern at the jit boundary.

    Axis choice matters: a UNet is dominated by [3, 3, C_in, C_out] conv
    kernels whose axis 0 (= 3) never divides the device count — an axis-0-only
    rule would leave the bulk of the optimizer memory replicated. Picking the
    largest divisible axis (here C_out, a multiple of 32) shards every conv
    kernel, every attention projection, and every bias of size >= N.
    """
    n = mesh.devices.size

    def leaf_sharding(x):
        if not hasattr(x, "shape") or x.ndim == 0 or n <= 1:
            return NamedSharding(mesh, P())
        best_axis = largest_divisible_axis(x.shape, n)
        if best_axis is None:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        spec[best_axis] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf_sharding, pytree)


def tp_shardings(mesh: Mesh, params) -> object:
    """Megatron-style tensor-parallel shardings for the UNet parameter tree.

    Column-parallel (output dim over ``model``): attention to_q/to_k/to_v (the
    head dimension splits across devices) and the GEGLU up-projection (its
    2*4C output splits so the gate/value halves shard identically).
    Row-parallel (input dim over ``model``): the attention output projection
    and the FFN down-projection — XLA inserts the psum after each.
    Everything else (convs, norms, time embeddings, biases) replicates over
    ``model``; all params replicate over ``data`` (DP gradients psum there).
    """
    col_parallel = ("to_q", "to_k", "to_v", "proj")
    row_parallel = ("out", "to_out")

    def leaf_sharding(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if not hasattr(x, "ndim") or x.ndim != 2 or names[-1] != "kernel":
            return NamedSharding(mesh, P())
        owner = names[-2] if len(names) >= 2 else ""
        n = mesh.shape[MODEL_AXIS]
        if owner in col_parallel and x.shape[1] % n == 0:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if owner in row_parallel and x.shape[0] % n == 0:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def combine_zero(mesh: Mesh, pytree, base_tree) -> object:
    """Layer ZeRO data-axis sharding on top of existing (e.g. TP) shardings:
    each leaf additionally shards its largest not-yet-sharded axis over
    ``data`` when divisible. Used for optimizer state under 2-D meshes."""
    n = mesh.shape[DATA_AXIS]

    def combine(x, base):
        if not hasattr(x, "shape") or x.ndim == 0 or n <= 1:
            return base
        spec = list(base.spec) + [None] * (x.ndim - len(base.spec))
        best_axis, best_size = None, 0
        for axis, size in enumerate(x.shape):
            if spec[axis] is None and size > best_size and size % n == 0:
                best_axis, best_size = axis, size
        if best_axis is None:
            return base
        spec[best_axis] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(combine, pytree, base_tree)


def host_offload_shardings(sharding_tree):
    """Re-target a sharding tree at pinned host memory (DeepSpeed
    offload_optimizer_device="cpu" analog, train_unet.py:101-109).

    Arrays placed with these shardings live in host RAM; XLA streams them to
    the device where the jitted update consumes them. Layout (which axis
    shards over ``data``) is preserved, so ZeRO + offload compose.
    """
    return jax.tree_util.tree_map(
        lambda s: s.with_memory_kind("pinned_host"), sharding_tree
    )


def per_device_bytes(pytree, device=None) -> int:
    """Measured per-device footprint of a pytree: sum of the addressable shard
    bytes held by ``device`` (default: the first local device), counting only
    device-memory residents (host-offloaded buffers are excluded).

    This measures what is actually allocated per device for these arrays —
    the number that proves (or disproves) a ZeRO sharding claim.
    """
    device = device or jax.local_devices()[0]
    total = 0
    for leaf in jax.tree_util.tree_leaves(pytree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        kind = getattr(leaf.sharding, "memory_kind", None)
        if kind not in (None, "device", "tpu_hbm"):
            continue  # offloaded to host: not a device-memory resident
        for shard in leaf.addressable_shards:
            if shard.device == device:
                total += shard.data.nbytes
    return total


def put_replicated(mesh: Mesh, pytree):
    """Place a host pytree on the mesh fully replicated."""
    return jax.device_put(pytree, replicated(mesh))


def put_batch(mesh: Mesh, batch):
    """Place a host batch on the mesh, sharded along axis 0.

    Single-process: a plain device_put. Multi-host pods: each process passes its
    LOCAL rows (global_batch / process_count) and the global array is assembled
    with ``make_array_from_process_local_data`` — the jax-native analog of the
    per-rank DataLoader sharding Accelerate does in the reference
    (train_unet.py:170-182).
    """
    sharding = data_sharded(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )


def put_batch_chunk(mesh: Mesh, batch):
    """Place a CHUNK of stacked batches [n_steps, batch, ...]: the leading
    scan axis stays unsharded, the per-step batch axis (1) shards over data.

    Used by the trainer's ``--steps-per-dispatch`` chained-step path, which
    scans n_steps train steps inside one XLA program."""
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
