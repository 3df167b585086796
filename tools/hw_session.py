#!/usr/bin/env python
"""Resumable one-command TPU hardware session: every queued chip measurement.

The TPU tunnel has been down for long stretches (10+ h observed); when it
comes back the window may be short. This driver runs ALL queued round-4
measurements as same-session A/Bs (chip speed varies ~6% day to day — only
same-session pairs are trustworthy, docs/PERFORMANCE.md), appending each
result to HW_SESSION_r04.jsonl as it lands. Completed phases are skipped on
re-launch, so a flaky window can be consumed incrementally:

    timeout 36000 python tools/hw_session.py        # re-run until "ALL DONE"

Each phase is a SUBPROCESS with its own timeout: the chip is single-tenant
and a wedged program must be abandonable without killing the driver; a fresh
process per phase also keeps env-knob A/Bs honest (JAX reads most knobs at
import). Phase 1 doubles as the tunnel probe: bench.py's attach watchdog
(exit 3) aborts the whole session early when the tunnel is still down.

Phases (see CLAUDE.md "Queued hardware measurements"):
  headline                 bench.py sampling headline (concat-free path is
                           the default — this IS the round-4 number)
  headline_concat_mat      + SD_MATERIALIZE_SKIP_CONCAT=1 (round-3 path)
  deepcache3               + BENCH_DEEP_CACHE=3 (approximate gear re-check)
  train_base               tools/bench_train.py SD-1.5-scale defaults
  train_concat_mat         + SD_MATERIALIZE_SKIP_CONCAT=1
  train_chain8             + TB_CHAIN=8 (steps-per-dispatch analog)
  train_nu_bf16            + TB_NU_DTYPE=bf16
  train_mu_nu_bf16         + TB_MU_DTYPE=bf16 TB_NU_DTYPE=bf16
  train_8bit               + TB_OPT=8bit (layout-preserving int8 Adam —
                           round 3's flat blocking measured 364 vs 312 ms)
  refscale_spd1 / _spd8    train_unet.py reference-scale (64px, latent
                           cache) SD_TRAIN_PROFILE=1 chained-dispatch A/B
  autotune_sample          flash fwd block sweep at 512 (AT defaults)

A final "summary" record derives the A/B ratios. BENCH/TB/AT env knobs pass
through, so a custom sweep can be layered on top.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, os.environ.get("HW_OUT", "HW_SESSION_r04.jsonl"))
PY = sys.executable

REFSCALE_ARGS = [
    "train_unet.py", "--dataset", "synthetic", "--resolution", "64",
    "--max-train-samples", "512", "--train-batch-size", "8",
    "--gradient-accumulation-steps", "1", "--max-train-steps", "100",
    "--log-interval", "0", "--checkpointing-steps", "100000",
    "--ckpt-dir", "/tmp/hw_session_ckpt",
    "--latent-cache", "/tmp/hw_session_lat64.npz",
]

PHASES = [
    # (name, argv, env updates, timeout_s, parser)
    # attach can take 70-95s through a slow-but-alive tunnel (measured
    # 2026-08-18); 300s still fails fast when the tunnel is truly down
    ("headline", ["bench.py"], {"BENCH_ATTACH_TIMEOUT_S": "300"}, 2700, "json"),
    ("headline_concat_mat", ["bench.py"],
     {"SD_MATERIALIZE_SKIP_CONCAT": "1"}, 2700, "json"),
    ("deepcache3", ["bench.py"], {"BENCH_DEEP_CACHE": "3"}, 2700, "json"),
    ("train_base", ["tools/bench_train.py"], {}, 2700, "json"),
    ("train_concat_mat", ["tools/bench_train.py"],
     {"SD_MATERIALIZE_SKIP_CONCAT": "1"}, 2700, "json"),
    ("train_chain8", ["tools/bench_train.py"], {"TB_CHAIN": "8"}, 2700, "json"),
    ("train_nu_bf16", ["tools/bench_train.py"], {"TB_NU_DTYPE": "bf16"}, 2700, "json"),
    ("train_mu_nu_bf16", ["tools/bench_train.py"],
     {"TB_MU_DTYPE": "bf16", "TB_NU_DTYPE": "bf16"}, 2700, "json"),
    ("train_8bit", ["tools/bench_train.py"], {"TB_OPT": "8bit"}, 2700, "json"),
    # fused Pallas int8 update (ops/adam8bit_update.py) vs the XLA lowering:
    # train_8bit above predates the kernel (= the xla path); the explicit
    # SD_ADAM8BIT_KERNEL pin keeps the pair honest if phases are re-run
    ("train_8bit_kernel", ["tools/bench_train.py"],
     {"TB_OPT": "8bit", "SD_ADAM8BIT_KERNEL": "auto"}, 2700, "json"),
    ("train_8bit_xla", ["tools/bench_train.py"],
     {"TB_OPT": "8bit", "SD_ADAM8BIT_KERNEL": "xla"}, 2700, "json"),
    ("refscale_spd1", REFSCALE_ARGS + ["--steps-per-dispatch", "1"],
     {"SD_TRAIN_PROFILE": "1"}, 3600, "profile"),
    ("refscale_spd8", REFSCALE_ARGS + ["--steps-per-dispatch", "8"],
     {"SD_TRAIN_PROFILE": "1"}, 3600, "profile"),
    ("autotune_sample", ["tools/autotune.py"], {}, 9000, "json"),
    # flash-block ladder across the resolution range (hires-fix path included);
    # each point is a fresh remote compile, so points are coarse and phases
    # separate (resumable). 256px has only 1024 kv tokens — small blocks only.
    ("autotune_256", ["tools/autotune.py"],
     {"BENCH_RES": "256", "AT_POINTS": "256,512,1024"}, 9000, "json"),
    ("autotune_768", ["tools/autotune.py"],
     {"BENCH_RES": "768", "AT_POINTS": "256,384,512"}, 9000, "json"),
    # 1024px runs the kv-blocked STREAMING kernel (16384 kv tokens overflow
    # the resident-KV design at any q-block — first sweep attempt measured
    # exactly that); points are streaming q-blocks
    ("autotune_1024", ["tools/autotune.py"],
     {"BENCH_RES": "1024", "AT_POINTS": "256,384,512", "BENCH_BATCH": "2"},
     9000, "json"),
]

_PROFILE_RE = re.compile(r"SD_TRAIN_PROFILE phase breakdown \(ms\): (.*)")


def _last_json(text: str):
    for line in reversed(text.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def _parse_profile(text: str):
    """Parse the trainer's final phase-breakdown log line into a dict."""
    match = None
    for m in _PROFILE_RE.finditer(text):
        match = m
    if match is None:
        return None
    out = {}
    for tok in match.group(1).split(", "):
        k, _, v = tok.partition("=")
        try:
            out[k.strip()] = float(v)
        except ValueError:
            pass
    return out or None


def _completed() -> dict:
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("ok"):
                    done[rec["phase"]] = rec
    return done


def _append(rec: dict) -> None:
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _run_phase(name, argv, env_up, timeout_s, parser) -> dict:
    env = dict(os.environ)
    env.update(env_up)
    cmd = [PY, os.path.join(REPO, argv[0])] + argv[1:]
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, env=env, capture_output=True, text=True,
            timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"phase": name, "ok": False, "error": f"timeout {timeout_s}s",
                "wall_s": round(time.time() - t0, 1)}
    text = p.stdout + "\n" + p.stderr
    result = _last_json(p.stdout) if parser == "json" else _parse_profile(text)
    if p.returncode == 3:  # bench.py attach watchdog: tunnel down
        return {"phase": name, "ok": False, "error": "tunnel_down", "rc": 3,
                "wall_s": round(time.time() - t0, 1)}
    if p.returncode != 0 or result is None:
        tail = text.strip().splitlines()[-3:]
        return {"phase": name, "ok": False, "rc": p.returncode,
                "error": " | ".join(tail)[-500:],
                "wall_s": round(time.time() - t0, 1)}
    if name.startswith("autotune") and result.get("best") is None:
        # autotune exits 0 even when every sweep point failed (e.g. the
        # tunnel dropped mid-session); recording ok would skip the ladder
        # forever on resume
        return {"phase": name, "ok": False, "error": "no_valid_points",
                "result": result, "wall_s": round(time.time() - t0, 1)}
    return {"phase": name, "ok": True, "result": result, "env": env_up,
            "wall_s": round(time.time() - t0, 1)}


def _summarize(done: dict) -> dict:
    s = {"phase": "summary", "ok": True}

    def val(phase, key):
        rec = done.get(phase)
        return rec["result"].get(key) if rec else None

    heads = val("headline", "value")
    if heads:
        s["headline_img_per_s"] = heads
        s["headline_vs_baseline"] = val("headline", "vs_baseline")
        mat = val("headline_concat_mat", "value")
        if mat:
            s["concat_free_sampling_speedup"] = round(heads / mat, 4)
        dc = val("deepcache3", "value")
        if dc:
            s["deepcache3_img_per_s"] = dc
    base_ms = val("train_base", "step_ms_p50")
    if base_ms:
        s["train_base_step_ms"] = base_ms
        for k, label in [
            ("train_concat_mat", "concat_materialized"),
            ("train_chain8", "chain8"),
            ("train_nu_bf16", "nu_bf16"),
            ("train_mu_nu_bf16", "mu_nu_bf16"),
            ("train_8bit", "adam8bit"),
            ("train_8bit_kernel", "adam8bit_kernel"),
            ("train_8bit_xla", "adam8bit_xla"),
        ]:
            v = val(k, "step_ms_p50")
            if v:
                s[f"train_{label}_step_ms"] = v
                s[f"train_{label}_speedup"] = round(base_ms / v, 4)
    p1 = done.get("refscale_spd1")
    p8 = done.get("refscale_spd8")
    if p1 and p8:
        a = p1["result"].get("step_ms_p50")
        b = p8["result"].get("step_ms_p50")
        if a and b:
            s["refscale_spd1_step_ms"] = a
            s["refscale_spd8_step_ms"] = b
            s["refscale_chain_speedup"] = round(a / b, 4)
            s["refscale_spd8_samples_per_s"] = round(8 * 1000.0 / b, 2)
    return s


def main() -> int:
    done = _completed()
    if done:
        print(f"resuming: {sorted(done)} already recorded in {OUT}",
              file=sys.stderr, flush=True)
    for name, argv, env_up, timeout_s, parser in PHASES:
        if name in done:
            continue
        print(f"=== phase {name}: {' '.join(argv)} {env_up}",
              file=sys.stderr, flush=True)
        rec = _run_phase(name, argv, env_up, timeout_s, parser)
        _append(rec)
        if rec.get("error") == "tunnel_down":
            print("tunnel down — aborting session (re-run to resume)",
                  file=sys.stderr)
            return 3
        if rec["ok"]:
            done[name] = rec
    _append(_summarize(done))
    missing = [p[0] for p in PHASES if p[0] not in done]
    if missing:
        print(f"INCOMPLETE — failed phases: {missing} (re-run to retry)",
              file=sys.stderr)
        return 1
    print("ALL DONE", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
