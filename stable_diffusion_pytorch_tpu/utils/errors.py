"""Failure capture for distributed runs.

Counterpart of the reference's elastic error propagation — the ``@record``
decorator from torch.distributed.elastic wrapping both trainer ``main``s
(/root/reference/train_unet.py:37,567; train_autoencoder.py:45,532) so worker
tracebacks survive process teardown. Here :func:`record` writes a per-host
crash file (JSON: host index, timestamp, exception, traceback) before
re-raising, which a pod launcher can collect from every host after a failure.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import traceback
from typing import Callable


def _host_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def record(fn: Callable, crash_dir: str = "logs/crashes") -> Callable:
    """Decorator: on exception, persist a per-host crash report, then re-raise."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except BaseException as e:
            if isinstance(e, (KeyboardInterrupt, SystemExit)):
                raise
            host = _host_index()
            try:
                os.makedirs(crash_dir, exist_ok=True)
                report = {
                    "host": host,
                    "time": time.time(),
                    "fn": getattr(fn, "__name__", str(fn)),
                    "exception": f"{type(e).__name__}: {e}",
                    "traceback": traceback.format_exc(),
                    "argv": sys.argv,
                }
                path = os.path.join(crash_dir, f"host{host}_{int(time.time())}.json")
                with open(path, "w") as f:
                    json.dump(report, f, indent=2)
                print(f"[record] crash report written to {path}", file=sys.stderr)
            except Exception:
                pass  # never mask the original error
            raise

    return wrapper
