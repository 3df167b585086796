#!/usr/bin/env python
"""VAE-decoder stage microbench: where do the 512x512 decode milliseconds go?

Chains each op K times (output feeds input) to amortize the ~27ms dispatch
overhead of the remote runtime. Stages: 3x3 conv at each decoder level, GN,
nearest-x2 upsample, full ResBlock, full decode.

Env: VB_CHAIN=10
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

CHAIN = int(os.environ.get("VB_CHAIN", "10"))


def timeit(name, fn, *args, repeats=5, chain=CHAIN):
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
    key = jax.random.PRNGKey(0)

    null = timeit("null", lambda x: x + 1.0, jnp.zeros((), jnp.float32))
    print(f"{'null dispatch':38s} {null * 1e3:9.2f} ms", flush=True)

    from flax import linen as nn

    from stable_diffusion_pytorch_tpu.models.blocks import (
        GroupNormSiLU,
        ResBlock,
        UpSample,
        conv3x3,
    )

    def chained(module, params, x):
        def body(carry, _):
            out = module.apply(params, carry)
            # keep shapes: renormalize back into the carry's shape when they
            # differ (upsample) by striding
            if out.shape != carry.shape:
                out = out[:, :: out.shape[1] // carry.shape[1],
                          :: out.shape[2] // carry.shape[2], : carry.shape[3]]
            return out.astype(carry.dtype), ()

        def run(xx):
            y, _ = jax.lax.scan(body, xx, None, length=CHAIN)
            return y

        best = timeit("", run, x)
        return (best - null) / CHAIN * 1e3

    shapes = [
        ("conv3x3 512x512x128", (4, 512, 512, 128)),
        ("conv3x3 256x256x256", (4, 256, 256, 256)),
        ("conv3x3 128x128x512", (4, 128, 128, 512)),
        ("conv3x3  64x 64x512", (4, 64, 64, 512)),
    ]
    for name, shape in shapes:
        x = jax.random.normal(key, shape, dtype)
        conv = conv3x3(shape[-1], dtype=dtype)
        params = conv.init(key, x)
        ms = chained(conv, params, x)
        flops = 2 * shape[0] * shape[1] * shape[2] * shape[3] * shape[3] * 9
        print(f"{name:38s} {ms:9.3f} ms  ({flops / ms / 1e9:.0f} GF/s)", flush=True)

    for name, shape, groups in [
        ("GN+SiLU 512x512x128", (4, 512, 512, 128), 32),
        ("GN+SiLU 128x128x512", (4, 128, 128, 512), 32),
    ]:
        x = jax.random.normal(key, shape, dtype)
        gn = GroupNormSiLU(groups, dtype=dtype)
        params = gn.init(key, x)
        ms = chained(gn, params, x)
        print(f"{name:38s} {ms:9.3f} ms", flush=True)

    for name, shape in [
        ("UpSample 256x256x512 -> 512", (4, 256, 256, 512)),
        ("UpSample 128x128x512 -> 256", (4, 128, 128, 512)),
    ]:
        x = jax.random.normal(key, shape, dtype)
        up = UpSample(dtype=dtype)
        params = up.init(key, x)
        ms = chained(up, params, x)
        print(f"{name:38s} {ms:9.3f} ms", flush=True)

    for name, shape in [
        ("ResBlock 512x512x128", (4, 512, 512, 128)),
    ]:
        x = jax.random.normal(key, shape, dtype)
        rb = ResBlock(groups=32, dtype=dtype)
        params = rb.init(key, x, None)
        mod = nn.Sequential([])  # placeholder; apply directly below

        def run(xx, params=params, rb=rb):
            def body(carry, _):
                return rb.apply(params, carry, None).astype(carry.dtype), ()

            y, _ = jax.lax.scan(body, xx, None, length=CHAIN)
            return y

        best = timeit("", run, x)
        print(f"{name:38s} {(best - null) / CHAIN * 1e3:9.3f} ms", flush=True)

    # full decode (from-scratch sd15 VAE, the bench configuration)
    from stable_diffusion_pytorch_tpu.models import presets
    from stable_diffusion_pytorch_tpu.models.autoencoder import AutoEncoderKL

    vae = AutoEncoderKL.from_config(presets.sd15_autoencoder_config(), dtype=dtype)
    zshape = jax.eval_shape(
        lambda: vae.init(key, jnp.zeros((1, 512, 512, 3), dtype))
    )
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), zshape)
    z = jax.random.normal(key, (4, 64, 64, 4), dtype)
    best = timeit(
        "", lambda p, zz: vae.apply(p, zz, method=vae.decode), params, z
    )
    print(f"{'full decode (batch 4, 1 call)':38s} {(best - null) * 1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
