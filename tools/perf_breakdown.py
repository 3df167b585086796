#!/usr/bin/env python
"""Ablation timings for the SD-1.5 sampling stack on the local chip.

Times (a) one UNet forward at CFG batch, (b) the same UNet with attention
stripped, (c) VAE decode, (d) CLIP encode — to show where the per-step budget
goes. Uses the persistent compile cache, so re-runs are cheap.
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

from stable_diffusion_pytorch_tpu.models import presets  # noqa: E402
from stable_diffusion_pytorch_tpu.models.autoencoder import AutoEncoderKL  # noqa: E402
from stable_diffusion_pytorch_tpu.models.clip import CLIPTextTransformer  # noqa: E402
from stable_diffusion_pytorch_tpu.models.unet import UNetModel  # noqa: E402


def timeit(name, fn, *args, repeats=5):
    # NOTE: on the axon remote runtime block_until_ready does not wait for
    # compute — fold a f32 sum into the jitted program and pull the scalar to
    # host (float()) to force completion.
    timed = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(timed(*args))  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(timed(*args))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:40s} {best * 1e3:9.2f} ms", flush=True)
    return best


def zeros_params(module, *init_args):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *init_args))
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B = int(os.environ.get("PB_BATCH", "8"))  # CFG-doubled batch for batch 4
    res = 512
    lat = 64

    unet_cfg = presets.sd15_unet_config()
    vae_cfg = presets.sd15_autoencoder_config()

    x = jnp.zeros((B, lat, lat, 4), dtype)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 77, 768), dtype)

    unet = UNetModel.from_config(4, 32, unet_cfg, dtype=dtype)
    p_unet = zeros_params(unet, x[:1], t[:1], ctx[:1])
    timeit("unet fwd (CFG batch)", jax.jit(unet.apply), p_unet, x, t, ctx)

    import dataclasses

    noattn_cfg = dataclasses.replace(unet_cfg, attention_resolutions=[])
    unet_na = UNetModel.from_config(4, 32, noattn_cfg, dtype=dtype)
    p_na = zeros_params(unet_na, x[:1], t[:1], ctx[:1])
    timeit("unet fwd NO attention", jax.jit(unet_na.apply), p_na, x, t, ctx)

    vae = AutoEncoderKL.from_config(vae_cfg, dtype=dtype)
    p_vae = zeros_params(vae, jnp.zeros((1, res, res, 3), dtype))
    z = jnp.zeros((B // 2, lat, lat, 4), dtype)
    timeit(
        "vae decode (batch 4)",
        jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode)),
        p_vae,
        z,
    )

    clip = CLIPTextTransformer(dtype=dtype)
    ids = jnp.zeros((B // 2, 77), jnp.int32)
    p_clip = zeros_params(clip, ids[:1])
    timeit("clip encode (batch 4)", jax.jit(clip.apply), p_clip, ids)


if __name__ == "__main__":
    main()
