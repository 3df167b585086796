"""StepTimer / PhaseTimer (utils/profiling.py).

The reference has no profiling subsystem (SURVEY §5); these are the TPU
framework's own step-time and host-phase attribution tools, used by the
trainer (`SD_TRAIN_PROFILE=1`) and by the perf docs' device-vs-wall gap
analysis.
"""

import time

from stable_diffusion_pytorch_tpu.utils.profiling import PhaseTimer, StepTimer


def test_step_timer_warmup_and_percentiles():
    t = StepTimer(warmup=2)
    for _ in range(5):
        with t:
            pass
    # first 2 iterations are warmup (compile steps), 3 recorded
    assert len(t.durations) == 3
    s = t.summary_ms()
    assert set(s) == {"step_ms_p50", "step_ms_p90", "step_ms_mean"}
    assert s["step_ms_p50"] <= s["step_ms_p90"] or abs(
        s["step_ms_p50"] - s["step_ms_p90"]
    ) < 1e-6


def test_phase_timer_attribution():
    p = PhaseTimer(warmup=1)
    for _ in range(3):
        with p.phase("dispatch"):
            time.sleep(0.002)
        p.add("sync", 0.001)
    s = p.summary_ms()
    # warmup=1 drops the first sample of each phase independently
    assert len(p.samples["dispatch"]) == 2
    assert len(p.samples["sync"]) == 2
    assert s["dispatch_ms_p50"] >= 1.0
    assert abs(s["sync_ms_mean"] - 1.0) < 1e-6


def test_phase_timer_timed_iter():
    p = PhaseTimer(warmup=0)
    items = list(p.timed_iter(range(4), "fetch"))
    assert items == [0, 1, 2, 3]
    assert len(p.samples["fetch"]) == 4
    # empty iterable: no yield, no crash
    assert list(p.timed_iter([], "fetch2")) == []
    assert "fetch2" not in p.samples


def test_step_timer_skip_next():
    from stable_diffusion_pytorch_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=0)
    t.add(1.0)
    t.skip_next()
    t.add(99.0)  # dropped (mid-run compile)
    t.add(2.0)
    assert t.durations == [1.0, 2.0]


def test_phase_timer_skip_next_is_per_phase():
    from stable_diffusion_pytorch_tpu.utils.profiling import PhaseTimer

    p = PhaseTimer(warmup=0)
    p.add("dispatch", 1.0)
    p.skip_next("dispatch")
    p.add("dispatch", 99.0)  # dropped
    p.add("place", 5.0)      # other phases unaffected
    p.add("dispatch", 2.0)
    assert p.samples["dispatch"] == [1.0, 2.0]
    assert p.samples["place"] == [5.0]
