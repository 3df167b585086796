#!/usr/bin/env python
"""Ablation timings for the SD-1.5 TRAIN step on the local chip.

Times (a) the full jitted train step, (b) value_and_grad only (no optimizer),
(c) the AdamW update alone on the SD-1.5 param tree, (d) the frozen CLIP
encode, to show where the 300+ms step budget goes. Uses the persistent
compile cache.

Env: TB_BATCH (8), TB_MU_DTYPE (f32|bf16) to A/B the first-moment dtype.
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
import optax  # noqa: E402

from stable_diffusion_pytorch_tpu.models import presets  # noqa: E402
from stable_diffusion_pytorch_tpu.models.clip import CLIPTextTransformer  # noqa: E402
from stable_diffusion_pytorch_tpu.models.schedule import make_schedule  # noqa: E402
from stable_diffusion_pytorch_tpu.models.unet import UNetModel  # noqa: E402
from stable_diffusion_pytorch_tpu.trainers.steps import (  # noqa: E402
    TrainState,
    make_unet_train_step,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, *args, repeats=4):
    timed = jax.jit(fn)
    out = timed(*args)  # compile + warmup
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # axon: block_until_ready does not wait; pull a scalar
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(first).astype(jnp.float32))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = timed(*args)
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(first).astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:44s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    batch = int(os.environ.get("TB_BATCH", "8"))
    mu_dtype = os.environ.get("TB_MU_DTYPE", "f32")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    unet = UNetModel.from_config(4, 32, presets.sd15_unet_config(), dtype=dtype)
    clip = CLIPTextTransformer(dtype=dtype)
    schedule = make_schedule(presets.sd15_ddpm_config())

    lat = jnp.zeros((batch, 64, 64, 4), dtype)
    ids = jnp.zeros((batch, 77), jnp.int32)
    key = jax.random.PRNGKey(0)

    def zeros_params(module, *init_args):
        shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *init_args))
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    unet_params = zeros_params(
        unet, lat[:1], jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768), dtype)
    )
    clip_params = zeros_params(clip, ids[:1])

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(unet_params))
    log(f"batch={batch} params={n_params/1e6:.0f}M mu_dtype={mu_dtype}")

    tx = optax.adamw(
        1e-4, mu_dtype=jnp.bfloat16 if mu_dtype == "bf16" else None
    )
    train_step, _ = make_unet_train_step(
        unet, clip, None, schedule, tx, train_with_cfg=False, cfg_dropout_prob=0.1
    )
    state = TrainState.create(unet_params, tx)
    batch_d = {"latents": lat, "input_ids": ids}
    uncond = jnp.full((77,), 49407, jnp.int32)

    # (d) CLIP encode alone
    timeit("clip encode", lambda p, i: clip.apply(p, i), clip_params, ids)

    # (b) grads only
    def grads_only(params, cp, b, k):
        def loss(p):
            ctx = jax.lax.stop_gradient(clip.apply(cp, b["input_ids"]))
            k1, k2, k3 = jax.random.split(k, 3)
            noise = jax.random.normal(k1, b["latents"].shape, dtype)
            t = jax.random.randint(k2, (batch,), 0, schedule.noise_steps)
            from stable_diffusion_pytorch_tpu.models import schedule as S

            x_t = S.add_noise(schedule, b["latents"], noise, t)
            eps = unet.apply(p, x_t, t, ctx)
            return jnp.mean((eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)

        return jax.grad(loss)(params)

    timeit("unet fwd+bwd (grads only)", grads_only, unet_params, clip_params, batch_d, key)

    # (c) AdamW update alone
    grads = jax.tree_util.tree_map(jnp.zeros_like, unet_params)

    def adam_only(g, s):
        updates, new_opt = tx.update(g, s.opt_state, s.params)
        return optax.apply_updates(s.params, updates)

    timeit("adamw update alone", adam_only, grads, state)

    # (a) full train step
    timeit(
        "FULL train step",
        lambda s, cp, b, k: train_step(s, cp, None, b, uncond, k)[0].params,
        state, clip_params, batch_d, key,
    )


if __name__ == "__main__":
    main()
