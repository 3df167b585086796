"""Regression: the FID-parity harness runs and discriminates.

Full-size numbers live in docs/BENCHMARKS (tools/fid_eval.py at FID_N=64):
latent-space FID(ref, ours-compat) = 0.218 vs noise floor 0.223 — parity —
while FID(ref, ours-default) = 23.9 reflects the intentional correct-math
divergence. This test runs the same harness tiny and asserts the ordering.
"""

import os
import sys

import pytest

sys.path.append("/root/reference")  # APPEND: must not shadow repo-root modules (train_unet, scripts)

try:
    import stable_diffusion.models.utils  # noqa: F401

    REFERENCE_OK = True
except Exception:
    REFERENCE_OK = False

pytestmark = pytest.mark.skipif(not REFERENCE_OK, reason="reference not importable")


def test_fid_eval_runs_and_discriminates(monkeypatch):
    monkeypatch.setenv("FID_N", "16")
    monkeypatch.setenv("FID_STEPS", "4")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import fid_eval

    result = fid_eval.main()
    floor = result["fid_latent_ref_vs_ref"]
    compat = result["fid_latent_ref_vs_compat"]
    default = result["fid_latent_ref_vs_default"]
    assert floor is not None and compat is not None and default is not None
    # compat mode must sit near the same-distribution noise floor...
    assert compat < 10 * max(floor, 0.05), (floor, compat)
    # ...and the correct-math default must be clearly separated from it
    assert default > 3 * compat, (compat, default)
