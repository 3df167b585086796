"""Multi-host initialization for pod-scale runs.

The reference relies on ``accelerate launch`` + torch elastic to spawn and wire
ranks (/root/reference/train_unet.py:37,567; accelerate_config YAMLs). On TPU
pods each host runs the same program and joins the global runtime via
``jax.distributed.initialize``; data sharding per host is handled by the
DataLoader's (shard_id, num_shards) and the mesh covers all global devices.

``maybe_initialize`` is a safe no-op for single-host runs (the common case in
this repo's tests/bench) and reads the standard TPU pod environment when
present.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_INITIALIZED = False


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    Triggers when explicit args are given or JAX_COORDINATOR_ADDRESS /
    MEGASCALE_COORDINATOR_ADDRESS is set; returns True if initialization
    happened. Single-host: returns False without touching the runtime.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ) or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False

    import jax

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    logger.info(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {len(jax.local_devices())} local devices"
    )
    try:
        # Establish the cross-host collective fabric NOW, while all processes
        # are still in lockstep. The first collective performs a context
        # handshake with a short (~30s) key-exchange deadline; deferring it to
        # after model compilation lets per-host compile skew blow that window
        # (observed with Gloo on CPU; harmless everywhere).
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sd_tpu_init_barrier")
        logger.info("cross-host collective fabric warmed (init barrier passed)")
    except Exception as e:  # pragma: no cover - diagnostic only
        logger.warning(f"init barrier failed (continuing): {e}")
    return True


def host_shard_info() -> tuple:
    """(shard_id, num_shards) for per-host data sharding."""
    import jax

    return jax.process_index(), jax.process_count()
