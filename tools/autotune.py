#!/usr/bin/env python
"""Kernel block-size autotune sweep on the local chip.

Times the end-to-end bench pipeline across SD_FLASH_BLOCK_N (and optionally the
bwd blocks via the train bench) and reports the best. Each point costs one
remote compile (~3-8 min cold), so sweeps are coarse by default.

Usage:
    python tools/autotune.py                 # sampling sweep: 256 384 512
    AT_POINTS="128,256,512" python tools/autotune.py
    AT_MODE=train python tools/autotune.py   # sweeps SD_FLASH_BWD_BLOCK_N
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(env_updates: dict, script: str) -> dict:
    env = dict(os.environ, **{k: str(v) for k, v in env_updates.items()})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": out.stderr.strip().splitlines()[-1] if out.stderr else "no output"}


def main() -> None:
    mode = os.environ.get("AT_MODE", "sample")
    points = [int(p) for p in os.environ.get("AT_POINTS", "256,384,512").split(",")]
    results = []
    for p in points:
        if mode == "train":
            env = {"SD_FLASH_BWD_BLOCK_N": p, "TB_REPEATS": 3}
            script = "tools/bench_train.py"
        else:
            env = {"SD_FLASH_BLOCK_N": p, "BENCH_REPEATS": 3}
            script = "bench.py"
        print(f"== point {p} ==", file=sys.stderr, flush=True)
        r = run_point(env, script)
        r["point"] = p
        results.append(r)
        print(json.dumps(r), file=sys.stderr, flush=True)

    valid = [r for r in results if "value" in r]
    best = max(valid, key=lambda r: r["value"]) if valid else None
    print(json.dumps({"mode": mode, "results": results, "best": best}))


if __name__ == "__main__":
    main()
