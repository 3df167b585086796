"""Platform selection helper.

Some environments register a TPU PJRT plugin from ``sitecustomize`` and force
``jax.config.jax_platforms`` at interpreter startup, which silently overrides
the ``JAX_PLATFORMS`` environment variable for every process. Entry points call
:func:`ensure_platform` first so the env var wins again — in particular
``JAX_PLATFORMS=cpu python scripts/txt2img.py`` must actually run on CPU
(BASELINE.json config #1 is CPU-runnable).
"""

from __future__ import annotations

import os


def ensure_platform() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backends already initialized: keep whatever is live


def enable_compilation_cache(cache_dir: str = "") -> None:
    """Enable the persistent XLA compilation cache.

    TPU compiles in this environment go through a remote-compile relay and run
    minutes even for small programs; the persistent cache makes re-runs (bench,
    trainers, repeated CLI sampling) start in seconds.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
