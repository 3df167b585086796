"""Profiling / tracing: per-step timing and jax.profiler capture.

The reference has no dedicated profiling support (SURVEY §5 — only
CUDA_LAUNCH_BLOCKING pinning and tqdm timing). Here:

- :class:`StepTimer` records wall-clock per step and reports p50/p90/mean —
  "UNet step p50 ms" is a driver metric (BASELINE.json).
- :func:`trace` wraps a block in a ``jax.profiler`` trace whose output can be
  opened in TensorBoard/XProf (works on TPU and CPU backends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.durations: List[float] = []
        self.warmup = warmup
        self._seen = 0
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.add(time.perf_counter() - self._t0)

    def add(self, dt: float) -> None:
        """Record an externally-measured duration (e.g. chunk wall / n_steps
        from the trainer's chained-dispatch path)."""
        if getattr(self, "_skip", 0) > 0:
            self._skip -= 1
            return
        self._seen += 1
        if self._seen > self.warmup:
            self.durations.append(dt)

    def skip_next(self, n: int = 1) -> None:
        """Drop the next ``n`` samples (e.g. a mid-run XLA compile the fixed
        ``warmup`` cannot anticipate, like the first single-step dispatch
        after a chained run compiles a second program)."""
        self._skip = getattr(self, "_skip", 0) + n

    def percentile(self, q: float) -> float:
        if not self.durations:
            return float("nan")
        xs = sorted(self.durations)
        idx = min(int(len(xs) * q / 100.0), len(xs) - 1)
        return xs[idx]

    def summary_ms(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        return {
            "step_ms_p50": self.percentile(50) * 1e3,
            "step_ms_p90": self.percentile(90) * 1e3,
            "step_ms_mean": sum(self.durations) / len(self.durations) * 1e3,
        }


class PhaseTimer:
    """Per-step wall-time attribution across named phases.

    Used by the trainer when ``SD_TRAIN_PROFILE=1`` to break the wall step
    into host phases (loader ``fetch``, ``place`` host→device transfer,
    ``dispatch`` = jitted-step call + block_until_ready, ``sync`` = the
    loss scalar pull that actually waits for the device on the axon
    runtime). The reference has no such breakdown; this is how the
    device-vs-wall gap at reference scale was attributed (docs/PERFORMANCE.md
    "input pipeline" section).
    """

    def __init__(self, warmup: int = 2):
        self.samples: Dict[str, List[float]] = {}
        self.warmup = warmup
        self._seen: Dict[str, int] = {}

    def add(self, name: str, dt: float) -> None:
        skip = getattr(self, "_skip", None) or {}
        if skip.get(name, 0) > 0:
            skip[name] -= 1
            return
        seen = self._seen.get(name, 0) + 1
        self._seen[name] = seen
        if seen > self.warmup:
            self.samples.setdefault(name, []).append(dt)

    def skip_next(self, name: str, n: int = 1) -> None:
        """Drop the next ``n`` samples of ``name`` (mid-run compiles the
        fixed warmup cannot anticipate)."""
        if not hasattr(self, "_skip") or self._skip is None:
            self._skip = {}
        self._skip[name] = self._skip.get(name, 0) + n

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)

    def timed_iter(self, iterable, name: str = "fetch"):
        """Yield from ``iterable``, attributing each ``next()`` to ``name``."""
        it = iter(iterable)
        while True:
            t0 = time.perf_counter()
            try:
                item = next(it)
            except StopIteration:
                return
            self.add(name, time.perf_counter() - t0)
            yield item

    def summary_ms(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, xs in sorted(self.samples.items()):
            if not xs:
                continue
            s = sorted(xs)
            out[f"{name}_ms_p50"] = s[len(s) // 2] * 1e3
            out[f"{name}_ms_mean"] = sum(xs) / len(xs) * 1e3
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
