#!/usr/bin/env python
"""Resumable one-command TPU hardware session: every queued chip measurement.

The TPU tunnel can be down for long stretches (10+ h observed); when it comes
back the window may be short. This driver runs ALL queued measurements as
same-session A/Bs (chip speed varies ~6% day to day — only same-session pairs
are trustworthy, docs/PERFORMANCE.md), appending each result to the round's
JSONL as it lands. Completed phases are skipped on re-launch, so a flaky
window can be consumed incrementally:

    timeout 36000 python tools/hw_session.py        # re-run until "ALL DONE"

Each phase is a SUBPROCESS with its own timeout: the chip is single-tenant
and a wedged program must be abandonable without killing the driver; a fresh
process per phase also keeps env-knob A/Bs honest (JAX reads most knobs at
import). Phase 1 doubles as the tunnel probe: bench.py's attach watchdog
(exit 3) aborts the whole session early when the tunnel is still down.

Round-5 queue (VERDICT r4 "next round" items; r04 record: HW_SESSION_r04.jsonl):
  headline                  re-verify 1.137 img/s after the round-5 kernel edits
  train_base / train_chain8 same-session anchors for the composition A/Bs
  train_perf_preset         the SHIPPED config_presets/perf.json combination
                            (chain8 + bf16 mu/nu) — never measured composed
  train_perf_8bit           int8 Adam (Pallas kernel) + chain8 composition
  stream_fwd_sweep          streaming flash fwd block space at 16384 tokens
  stream_bwd_sweep          streaming backward SBWD blocks at 16384 tokens
  stream_x768               resident-vs-streaming crossover at 9216 tokens
  hires1024_bench           end-to-end 1024px bench at the sweep's best blocks
                            (@best references resolve from earlier phases)
  train_b16_full            batch-16 per-block full remat anchor (~894 ms r3)
  train_b16_convsave        batch-16 selective remat (save ResBlock convs,
                            recompute GN/SiLU/attention)
  headline_ddpm/_dpmpp      BASELINE config #2 samplers hardware-benched once
  headline_dpmpp25          the "dpmpp at 20-25 steps" speed point
  serve_sd15                TPU serving loadtest (batching ratio, p50/p95,
                            hot-swap latency with a warm jit cache)
  ilv16384/4096/9216        software-pipelined streaming kernel A/B at each
                            resolution's token count (SD_FLASH_INTERLEAVE:
                            overlap the next chunk's MXU score matmul with
                            the current chunk's VPU softmax — the serialized
                            kernel measured as their SUM, flat in blocks)
  hires1024_ilv             end-to-end 1024px bench at the ilv16384 best
  headline_ilv              512px headline with interleaved streaming forced
                            below the resident cutoff (vs resident default)

Env values of the form "@best:<phase>:<key>" resolve at launch time from the
named completed phase's result.best record — sweep phases feed confirm phases
without manual re-editing. A final "summary" record derives the A/B ratios.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, os.environ.get("HW_OUT", "HW_SESSION_r05.jsonl"))
PY = sys.executable

PHASES = [
    # (name, argv, env updates, timeout_s, parser)
    # attach can take 70-95s through a slow-but-alive tunnel (measured
    # 2026-08-18); 300s still fails fast when the tunnel is truly down
    ("headline", ["bench.py"], {"BENCH_ATTACH_TIMEOUT_S": "300"}, 2700, "json"),
    ("train_base", ["tools/bench_train.py"], {}, 2700, "json"),
    ("train_chain8", ["tools/bench_train.py"], {"TB_CHAIN": "8"}, 2700, "json"),
    # the shipped perf.json composition (VERDICT r4 missing #2): chain8 +
    # bf16 mu AND nu moments, measured AS a combination for the first time
    ("train_perf_preset", ["tools/bench_train.py"],
     {"TB_CHAIN": "8", "TB_MU_DTYPE": "bf16", "TB_NU_DTYPE": "bf16"},
     2700, "json"),
    # int8 Adam (fused Pallas update kernel) composed with chained dispatch
    ("train_perf_8bit", ["tools/bench_train.py"],
     {"TB_OPT": "8bit", "TB_CHAIN": "8", "SD_ADAM8BIT_KERNEL": "auto"},
     2700, "json"),
    # --- hires MFU cliff (VERDICT r4 weak #1): streaming-kernel block space.
    # Kernel-standalone sweeps (chained calls, dispatch amortized), then an
    # end-to-end 1024px bench at the winning blocks.
    ("stream_fwd_sweep", ["tools/stream_attn_sweep.py"],
     {"SAS_MODE": "fwd"}, 9000, "json"),
    ("stream_bwd_sweep", ["tools/stream_attn_sweep.py"],
     {"SAS_MODE": "bwd"}, 9000, "json"),
    ("stream_x768", ["tools/stream_attn_sweep.py"],
     {"SAS_MODE": "x768"}, 9000, "json"),
    ("hires1024_bench", ["bench.py"],
     {"BENCH_RES": "1024", "BENCH_BATCH": "2",
      "SD_FLASH_BLOCK_N": "@best:stream_fwd_sweep:block_n",
      "SD_FLASH_BLOCK_M": "@best:stream_fwd_sweep:block_m"}, 2700, "json"),
    # --- batch-16 selective remat (VERDICT r4 weak #5): full per-block remat
    # anchor vs the conv-save policy (save conv outputs, recompute the rest)
    ("train_b16_full", ["tools/bench_train.py"],
     {"TB_BATCH": "16", "TB_REMAT": "full"}, 2700, "json"),
    ("train_b16_convsave", ["tools/bench_train.py"],
     {"TB_BATCH": "16", "TB_REMAT": "conv-save"}, 2700, "json"),
    # --- BASELINE config #2 samplers, hardware-benched once (VERDICT r4 #8)
    ("headline_ddpm", ["bench.py"], {"BENCH_SAMPLER": "ddpm"}, 2700, "json"),
    ("headline_dpmpp", ["bench.py"], {"BENCH_SAMPLER": "dpmpp"}, 2700, "json"),
    # --- round-5 backward MXU/VPU overlap: dp = do V^T (independent of the
    # score matmul) now issues BEFORE the softmax in every backward kernel,
    # and the fused kernel's dv accumulate before the dpp/t algebra. A/B
    # against same-session train_base (310.58 ms ran the old ordering) and
    # stream_bwd_sweep (228.5 ms/call at 16384 tokens, old ordering).
    # Ordered FIRST among the remaining phases: single cheap compiles with a
    # direct headline-training consequence; the compile-heavy ilv sweeps and
    # serve_sd15 follow.
    ("train_bwd_overlap", ["tools/bench_train.py"], {}, 2700, "json"),
    ("stream_bwd_overlap", ["tools/stream_attn_sweep.py"],
     {"SAS_MODE": "bwd", "SAS_POINTS": "256:1024,256:2048"}, 9000, "json"),
    # --- round-5 follow-on: software-pipelined streaming kernel
    # (SD_FLASH_INTERLEAVE). The first three sweeps measured the serialized
    # kernel at its MXU-roofline + VPU-softmax SUM with flat block curves;
    # these A/B the interleaved kernel at each resolution's token count,
    # then re-bench end-to-end at the winning settings.
    ("ilv16384", ["tools/stream_attn_sweep.py"],
     {"SAS_MODE": "ilv"}, 9000, "json"),
    ("ilv4096", ["tools/stream_attn_sweep.py"],
     {"SAS_MODE": "ilv", "SAS_N": "4096", "SAS_B": "8",
      "SAS_POINTS": "resident,2:512:512,4:512:512,4:512:1024,8:512:512"},
     9000, "json"),
    ("ilv9216", ["tools/stream_attn_sweep.py"],
     {"SAS_MODE": "ilv", "SAS_N": "9216", "SAS_B": "8",
      "SAS_POINTS": "resident,3:512:768,4:512:512,9:256:1024"},
     9000, "json"),
    # NOTE: only the STREAMING-specific knobs are forced here.
    # hires1024_bench measured 0.0936 img/s at the fwd sweep's "best"
    # SD_FLASH_BLOCK_N=2048 vs 0.115 at the baked table — a forced global
    # q-block pollutes the program's OTHER attention calls (4096/1024-token
    # levels), and the 16384-token call was flat in bn anyway. INTERLEAVE
    # and BLOCK_M only affect the streaming kernel, so they force cleanly;
    # bn comes from the autotune table.
    ("hires1024_ilv", ["bench.py"],
     {"BENCH_RES": "1024", "BENCH_BATCH": "2",
      "SD_FLASH_INTERLEAVE": "@best:ilv16384:ilv_u",
      "SD_FLASH_BLOCK_M": "@best:ilv16384:ilv_bm"}, 2700, "json"),
    ("headline_ilv", ["bench.py"],
     {"SD_FLASH_KV_RESIDENT_MAX": "1024",
      "SD_FLASH_INTERLEAVE": "@best:ilv4096:ilv_u",
      "SD_FLASH_BLOCK_M": "@best:ilv4096:ilv_bm"}, 2700, "json"),
    # --- BASELINE config #2 follow-on: the "dpmpp at 20-25 steps" speed point
    ("headline_dpmpp25", ["bench.py"],
     {"BENCH_SAMPLER": "dpmpp", "BENCH_STEPS": "25"}, 2700, "json"),
    # Clean re-run of the SD-scale backward-overlap A/B: the first
    # train_bwd_overlap (315.7 ms vs 310.6 base) ran while a CPU-side FID
    # harness contended for the single host core, which pollutes unchained
    # per-step dispatch. The chained 16384-token A/B showed a real 1.076x
    # (228.5 -> 212.4 ms/call), so the SD-scale number deserves an
    # uncontended measurement.
    ("train_bwd_clean", ["tools/bench_train.py"], {}, 2700, "json"),
    # --- TPU serving loadtest (VERDICT r4 weak #6): SD-1.5 stack on the chip.
    # max_batch 4 bounds the pow-2 bucket compile set {1,2,4}; each distinct
    # signature is a ~3-8 min remote compile, hence the generous timeout.
    # Ordered LAST: the most compile-heavy phase, after the kernel A/Bs.
    ("serve_sd15", ["tools/serve_loadtest.py"],
     {"LT_PRESET": "sd15", "LT_PLATFORM": "axon", "LT_STEPS": "50",
      "LT_SIZE": "512", "LT_REQUESTS": "12", "LT_CLIENTS": "4",
      "LT_MAX_BATCH": "4"}, 7200, "json"),
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


def _resolve_env(env_up: dict, done: dict):
    """Resolve "@best:<phase>:<key>" values from completed phase records.

    Returns (resolved_env, missing_phase_or_None). A missing/failed source
    phase defers the dependent phase (it is retried on the next launch)."""
    out = {}
    for k, v in env_up.items():
        if isinstance(v, str) and v.startswith("@best:"):
            _, phase, key = v.split(":", 2)
            rec = done.get(phase)
            best = (rec or {}).get("result", {}).get("best") or {}
            if key not in best:
                return None, phase
            out[k] = str(best[key])
        else:
            out[k] = v
    return out, None


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
    if "sweep" in name and result.get("best") is None:
        # a sweep that produced zero valid points must not be recorded ok
        # (resume would then skip it forever)
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
    for p in ("headline_ddpm", "headline_dpmpp", "headline_dpmpp25",
              "hires1024_bench"):
        v = val(p, "value")
        if v:
            s[f"{p}_img_per_s"] = v
            mfu = val(p, "mfu_pct")
            if mfu:
                s[f"{p}_mfu_pct"] = mfu
    base_ms = val("train_base", "step_ms_p50")
    if base_ms:
        s["train_base_step_ms"] = base_ms
        for k, label in [
            ("train_chain8", "chain8"),
            ("train_perf_preset", "perf_preset"),
            ("train_perf_8bit", "perf_8bit"),
        ]:
            v = val(k, "step_ms_p50")
            if v:
                s[f"train_{label}_step_ms"] = v
                s[f"train_{label}_speedup"] = round(base_ms / v, 4)
    b16_full = val("train_b16_full", "step_ms_p50")
    b16_sel = val("train_b16_convsave", "step_ms_p50")
    if b16_full:
        s["train_b16_full_samples_per_s"] = round(16e3 / b16_full, 2)
    if b16_sel:
        s["train_b16_convsave_samples_per_s"] = round(16e3 / b16_sel, 2)
    for p in ("stream_fwd_sweep", "stream_bwd_sweep", "stream_x768",
              "stream_bwd_overlap", "ilv16384", "ilv4096", "ilv9216"):
        rec = done.get(p)
        if rec:
            s[f"{p}_best"] = rec["result"].get("best")
    for p, label in (("train_bwd_overlap", "train_bwd_overlap"),
                     ("train_bwd_clean", "train_bwd_clean")):
        v = val(p, "step_ms_p50")
        if v:
            s[f"{label}_step_ms"] = v
    for p in ("hires1024_ilv", "headline_ilv"):
        v = val(p, "value")
        if v:
            s[f"{p}_img_per_s"] = v
            mfu = val(p, "mfu_pct")
            if mfu:
                s[f"{p}_mfu_pct"] = mfu
    rec = done.get("serve_sd15")
    if rec:
        r = rec["result"]
        s["serve_batching_speedup"] = r.get("batching_speedup")
        if isinstance(r.get("batching_on"), dict):
            s["serve_p50_s"] = r["batching_on"].get("p50_s")
            s["serve_p95_s"] = r["batching_on"].get("p95_s")
        if isinstance(r.get("hot_swap_under_load"), dict):
            s["serve_reload_latency_s"] = r["hot_swap_under_load"].get(
                "reload_latency_s"
            )
    return s


def main() -> int:
    done = _completed()
    if done:
        print(f"resuming: {sorted(done)} already recorded in {OUT}",
              file=sys.stderr, flush=True)
    deferred = []
    for name, argv, env_up, timeout_s, parser in PHASES:
        if name in done:
            continue
        env_res, missing = _resolve_env(env_up, done)
        if missing is not None:
            print(f"=== phase {name}: deferred (needs {missing} best)",
                  file=sys.stderr, flush=True)
            deferred.append(name)
            continue
        print(f"=== phase {name}: {' '.join(argv)} {env_res}",
              file=sys.stderr, flush=True)
        rec = _run_phase(name, argv, env_res, timeout_s, parser)
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
        print(f"INCOMPLETE — failed/deferred phases: {missing} (re-run to retry)",
              file=sys.stderr)
        return 1
    print("ALL DONE", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
