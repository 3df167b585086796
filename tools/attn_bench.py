#!/usr/bin/env python
"""Flash-attention kernel microbench on the local chip.

Times K chained attention calls (output feeds the next query, so XLA cannot
CSE/hoist them) and reports per-call time — isolating kernel cost from the
~30ms per-dispatch overhead of this remote runtime. Also times a null program
to report that overhead explicitly.

Env: AB_VARIANTS=exp2,exp,xla  AB_CHAIN=20  AB_SHAPES=self40,self80,cross40,vae512
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

SHAPES = {
    # [B, N, H, D] / kv_len — the SD-1.5 512x512 attention workloads (CFG batch 8)
    "self40": ((8, 4096, 8, 40), 4096),
    "self80": ((8, 1024, 8, 80), 1024),
    "self160": ((8, 256, 8, 160), 256),
    "cross40": ((8, 4096, 8, 40), 77),
    "vae512": ((4, 4096, 1, 512), 4096),
}


def timeit(name, fn, *args, repeats=5):
    timed = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(timed(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(timed(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    chain = int(os.environ.get("AB_CHAIN", "20"))
    variants = os.environ.get("AB_VARIANTS", "exp2,exp,xla").split(",")
    shapes = os.environ.get("AB_SHAPES", "self40,self80,cross40,vae512").split(",")

    null = timeit("null", lambda x: x + 1.0, jnp.zeros((), jnp.float32))
    print(f"{'null dispatch':34s} {null * 1e3:9.2f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    for shape_name in shapes:
        (b, n, h, d), kv = SHAPES[shape_name]
        q = jax.random.normal(key, (b, n, h, d), dtype)
        k = jax.random.normal(key, (b, kv, h, d), dtype)
        v = jax.random.normal(key, (b, kv, h, d), dtype)
        scale = d**-0.5

        for variant in variants:
            if variant == "xla":
                from stable_diffusion_pytorch_tpu.ops.attention import xla_attention

                call = lambda qq: xla_attention(qq, k, v, scale)  # noqa: E731
            else:
                os.environ["SD_FLASH_EXP2"] = "1" if variant == "exp2" else "0"
                from stable_diffusion_pytorch_tpu.ops.flash_attention import (
                    flash_attention,
                )

                call = lambda qq: flash_attention(qq, k, v, scale)  # noqa: E731

            def chained(qq):
                def body(carry, _):
                    o = call(carry)
                    return o, ()

                out, _ = jax.lax.scan(body, qq, None, length=chain)
                return out

            best = timeit(f"{shape_name}/{variant}", chained, q)
            per_call = (best - null) / chain * 1e3
            print(
                f"{shape_name + '/' + variant:34s} {per_call:9.3f} ms/call",
                flush=True,
            )


if __name__ == "__main__":
    main()
