#!/usr/bin/env python
"""Attribute the AdamW update phase's cost: HBM traffic vs per-leaf overhead
vs the runtime's ~30ms per-dispatch constant.

The SD-1.5 update streams ~24GB at f32 (read g,p,mu,nu / write p,mu,nu on
860M params) = ~29ms at the v5e's 819GB/s, but the standalone-timed phase is
~80ms for BOTH the optax chain and the fused single-expression transform
(tools/train_breakdown.py). This probe runs the fused update K times inside
ONE program (lax.fori_loop over the carried (params, state)) and reports the
K-slope — the true per-apply cost with the dispatch constant excluded — on
(a) one flat 860M leaf (pure bandwidth, no per-leaf overhead) and (b) a
synthetic tree matching SD-1.5's leaf-count/size distribution.

Env: AP_N (860_000_000 total elements), AP_LEAVES (686), AP_K (8).
"""

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

from stable_diffusion_pytorch_tpu.trainers.fused_adamw import fused_adamw  # noqa: E402


def time_program(fn, params, state, grads, repeats=4):
    # (params, state) are donated: thread the returned buffers back in
    params, state, probe = fn(params, state, grads)
    float(probe)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        params, state, probe = fn(params, state, grads)
        float(probe)
        times.append(time.perf_counter() - t0)
    del params, state
    return min(times)


def bench(name, tree_shapes, k_hi):
    tx = fused_adamw(1e-4, weight_decay=1e-2, max_grad_norm=0.1)

    def zeros():
        return {f"p{i}": jnp.zeros(s, jnp.float32) for i, s in enumerate(tree_shapes)}

    grads = zeros()

    def run_k(k):
        def prog(params, state, g):
            def body(_, carry):
                p, s = carry
                return tx.apply(g, s, p)

            p, s = jax.lax.fori_loop(0, k, body, (params, state))
            probe = jnp.sum(
                jax.tree_util.tree_leaves(p)[0].ravel()[:8].astype(jnp.float32)
            )
            return p, s, probe

        params = zeros()
        state = tx.init(params)
        jit_prog = jax.jit(prog, donate_argnums=(0, 1))
        return time_program(jit_prog, params, state, grads)

    t1 = run_k(1)
    tk = run_k(k_hi)
    per_apply = (tk - t1) / (k_hi - 1)
    n = sum(int(jnp.prod(jnp.array(s))) for s in tree_shapes)
    gb = n * 4 * 7 / 1e9  # r: g,p,mu,nu + w: p,mu,nu
    print(
        f"{name:26s} k=1 {t1 * 1e3:7.2f} ms | k={k_hi} {tk * 1e3:7.2f} ms | "
        f"per-apply {per_apply * 1e3:7.2f} ms = {gb / per_apply:.0f} GB/s eff "
        f"({len(tree_shapes)} leaves, {n / 1e6:.0f}M elems)",
        flush=True,
    )
    return per_apply


def main():
    total = int(os.environ.get("AP_N", str(860_000_000)))
    leaves = int(os.environ.get("AP_LEAVES", "686"))
    k_hi = int(os.environ.get("AP_K", "8"))

    # (a) one flat leaf — pure bandwidth, zero per-leaf overhead
    bench("flat single leaf", [(total,)], k_hi)

    # (b) SD-like distribution: a few huge leaves + a long tail of small ones
    # (the real tree: 686 leaves, biggest ~52M elems (1280x1280x3x3), median
    # ~1M, hundreds of sub-10K bias/scale leaves)
    big = [(52_000_000,)] * 8
    mid = [(4_000_000,)] * 80
    rest_n = total - 8 * 52_000_000 - 80 * 4_000_000
    tail_count = leaves - 88
    small = [(max(rest_n // tail_count, 1),)] * tail_count
    bench("sd-like 686-leaf tree", big + mid + small, k_hi)


if __name__ == "__main__":
    main()
