#!/usr/bin/env python
"""Same-session block sweep of the kv-blocked STREAMING flash kernels.

Round-4 landed the streaming fwd/bwd kernels (1024px = 16384 kv tokens, where
resident-KV overflows VMEM at any q-block) but never swept their block space:
the fwd q-block cap was a fixed 512, block_m a 1024 default, and the backward
blocks (SD_FLASH_SBWD_*) env-default guesses (VERDICT r4 weak #1). This tool
times the kernels standalone — chained lax.scan calls so XLA cannot CSE and
the ~35 ms/dispatch runtime constant amortizes — and reports ms/call per
block point, all in ONE process (same-session; env knobs are read at trace
time, so each point builds a fresh jit).

Modes (SAS_MODE):
  fwd   16384-token streaming forward:  points "bn:bm" (SAS_POINTS)
  bwd   16384-token streaming fwd+bwd:  points "bn:bm" for the SBWD kernels
  x768  9216-token resident-vs-streaming crossover (768px latents sit just
        under the 9216 _KV_RESIDENT_MAX where the resident kernel is
        strained): resident baseline + streaming at several block_m
  ilv   software-pipelined streaming fwd (SD_FLASH_INTERLEAVE): points are
        "U:bn:bm" (interleave depth U) or "resident" (the current-default
        baseline at this token count). SAS_N picks the token count: 16384
        (1024px), 9216 (768px), 4096 (512px — SAS_B=8 for the batch-4
        CFG-doubled headline shape). Motivated by the round-5 finding that
        the serialized streaming kernel's 43.8 ms at 16384 tokens is the SUM
        of its MXU roofline (~22 ms at D=40->128 padding) and VPU softmax
        (~20 ms) with flat block curves — the pipeline overlaps them.

Prints ONE JSON line {mode, shape, results: [...], best: {...}}. Per-point
failures (e.g. a VMEM-overflow compile) are recorded and skipped.

Shape default: the 1024px batch-2 CFG-doubled SD-1.5 self-attention
(B=4, H=8, D=40; N=M=16384), the exact workload bench.py times at
BENCH_RES=1024. Reference workload being optimized:
/root/reference/stable_diffusion/modules/transformer.py:100-111 (full-score
attention, which cannot reach these sizes at all).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from stable_diffusion_pytorch_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    ensure_platform,
)

ensure_platform()
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timeit(fn, args, repeats):
    jfn = jax.jit(fn)
    t0 = time.time()
    float(jfn(*args))  # compile + warmup (remote compile: 3-8 min cold)
    log(f"  compiled+warm in {time.time() - t0:.1f}s")
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jfn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    from stable_diffusion_pytorch_tpu.ops.flash_attention import flash_attention

    mode = os.environ.get("SAS_MODE", "fwd")
    n = int(os.environ.get("SAS_N", "16384"))
    b = int(os.environ.get("SAS_B", "4"))
    h, d = 8, 40
    chain = int(os.environ.get("SAS_CHAIN", "8"))
    repeats = int(os.environ.get("SAS_REPEATS", "3"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, n, h, d), dtype)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, n, h, d), dtype)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, n, h, d), dtype)
    scale = d**-0.5
    log(f"mode={mode} shape={(b, n, h, d)} chain={chain} backend={jax.default_backend()}")

    def fwd_chain(qq):
        def body(carry, _):
            return flash_attention(carry, k, v, scale), ()

        out, _ = jax.lax.scan(body, qq, None, length=chain)
        return jnp.sum(out.astype(jnp.float32))

    def bwd_chain(qq):
        def one(x, kk, vv):
            return jnp.sum(flash_attention(x, kk, vv, scale).astype(jnp.float32))

        def body(carry, _):
            # grad wrt all three inputs so the dq AND dkv kernels both run
            # (Pallas calls are opaque: touching one element forces the call)
            val, (gq, gk, gv) = jax.value_and_grad(one, argnums=(0, 1, 2))(
                carry, k, v
            )
            probe = (gk[0, 0, 0, 0] + gv[0, 0, 0, 0]).astype(jnp.float32)
            return carry + jnp.asarray(1e-6, dtype) * gq, val + probe

        out, vals = jax.lax.scan(body, qq, None, length=chain)
        return jnp.sum(vals) + jnp.sum(out.astype(jnp.float32)) * 0.0

    if mode == "fwd":
        points = os.environ.get(
            "SAS_POINTS", "512:1024,1024:1024,1024:512,2048:512,2048:256"
        ).split(",")
        env_for = lambda bn, bm: {  # noqa: E731
            "SD_FLASH_BLOCK_N": bn, "SD_FLASH_BLOCK_M": bm,
        }
        run = fwd_chain
    elif mode == "bwd":
        points = os.environ.get(
            "SAS_POINTS", "256:1024,128:1024,512:1024,256:512,256:2048"
        ).split(",")
        env_for = lambda bn, bm: {  # noqa: E731
            "SD_FLASH_SBWD_BLOCK_N": bn, "SD_FLASH_SBWD_BLOCK_M": bm,
        }
        run = bwd_chain
    elif mode == "x768":
        n = 9216  # 768px latents: (768/8)^2 self-attention tokens
        b = int(os.environ.get("SAS_B", "8"))  # 768px bench: batch 4 CFG-doubled
        q = jax.random.normal(key, (b, n, h, d), dtype)
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, n, h, d), dtype)
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, n, h, d), dtype)
        log(f"x768 shape={(b, n, h, d)}")
        points = os.environ.get(
            "SAS_POINTS", "resident,1024,2304,4608"
        ).split(",")

        def env_for_x(p):
            if p == "resident":
                # baked 768px best q-block (table: 9216 -> 384)
                return {"SD_FLASH_BLOCK_N": "384"}
            # force the streaming kernel below its resident cutoff
            return {
                "SD_FLASH_KV_RESIDENT_MAX": "8192",
                "SD_FLASH_BLOCK_M": p,
                "SD_FLASH_BLOCK_N": os.environ.get("SAS_X768_BN", "512"),
            }

        run = fwd_chain
    elif mode == "ilv":
        points = os.environ.get(
            "SAS_POINTS",
            "1:512:1024,2:512:1024,2:1024:512,4:512:512,4:256:1024,8:256:512",
        ).split(",")

        def env_for_ilv(p):
            if p == "resident":
                return {}  # whatever the dispatch default does at this N
            u, bn, bm = p.split(":")
            return {
                "SD_FLASH_KV_RESIDENT_MAX": "1024",  # force streaming
                "SD_FLASH_INTERLEAVE": u,
                "SD_FLASH_BLOCK_N": bn,
                "SD_FLASH_BLOCK_M": bm,
            }

        run = fwd_chain
    else:
        raise SystemExit(f"unknown SAS_MODE {mode!r}")

    results = []
    saved = {kk: os.environ.get(kk) for kk in (
        "SD_FLASH_BLOCK_N", "SD_FLASH_BLOCK_M", "SD_FLASH_KV_RESIDENT_MAX",
        "SD_FLASH_SBWD_BLOCK_N", "SD_FLASH_SBWD_BLOCK_M",
        "SD_FLASH_INTERLEAVE",
    )}
    for p in points:
        if mode == "x768":
            env = env_for_x(p)
            label = {"point": p}
        elif mode == "ilv":
            env = env_for_ilv(p)
            label = {"point": p}
        else:
            bn, _, bm = p.partition(":")
            env = env_for(bn, bm)
            label = {"block_n": int(bn), "block_m": int(bm)}
        for kk, vv in saved.items():  # reset, then apply this point's knobs
            if vv is None:
                os.environ.pop(kk, None)
            else:
                os.environ[kk] = vv
        os.environ.update(env)
        log(f"== point {p} env={env}")
        try:
            best = _timeit(run, (q,), repeats)
            rec = dict(label, ms_per_call=round(best / chain * 1e3, 3))
        except Exception as e:  # VMEM overflow etc: record, keep sweeping
            rec = dict(label, error=repr(e)[:300])
        results.append(rec)
        log(f"   -> {rec}")

    valid = [r for r in results if "ms_per_call" in r]
    best = min(valid, key=lambda r: r["ms_per_call"]) if valid else None
    if best is not None and mode == "ilv":
        # split "U:bn:bm" into @best-resolvable keys for confirm phases;
        # "resident" maps to the serialized-streaming defaults (u=1)
        best = dict(best)
        if best["point"] == "resident":
            best.update(ilv_u=1, ilv_bn=512, ilv_bm=1024)
        else:
            u, bn, bm = best["point"].split(":")
            best.update(ilv_u=int(u), ilv_bn=int(bn), ilv_bm=int(bm))
    print(json.dumps({
        "mode": mode, "shape": [b, n, h, d], "chain": chain,
        "results": results, "best": best,
    }), flush=True)


if __name__ == "__main__":
    main()
