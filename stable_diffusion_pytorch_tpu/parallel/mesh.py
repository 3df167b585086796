"""Device mesh + sharding helpers (the NCCL/Accelerate replacement).

The reference delegates all distribution to HF Accelerate over NCCL
(/root/reference/train_unet.py:97-110, accelerate_config YAMLs). The TPU-native
equivalent is a 1-D ``data`` mesh over ICI with XLA collectives inserted by the
compiler from sharding annotations:

- batch arrays: sharded on axis 0 over ``data`` (DDP analog)
- params: replicated (grad allreduce == XLA-inserted psum at the jit boundary)
- optimizer state: optionally sharded over ``data`` (DeepSpeed ZeRO-2 analog,
  train_unet.py:101-109) via :func:`zero_shardings`
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over local devices (or an explicit device list)."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 across the data axis (per-device batch slices)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shardings(mesh: Mesh, batch) -> object:
    """Sharding tree for a batch pytree: axis 0 over data for every leaf."""
    return jax.tree_util.tree_map(lambda _: data_sharded(mesh), batch)


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
        best_axis, best_size = None, 0
        for axis, size in enumerate(x.shape):
            if size > best_size and size % n == 0 and size > 0:
                best_axis, best_size = axis, size
        if best_axis is None:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        spec[best_axis] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf_sharding, pytree)


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
