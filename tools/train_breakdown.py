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
    # reduce the output to ONE scalar inside the program: keeps the result
    # buffer tiny (no extra 3.4GB grads tree resident between runs) and the
    # host float() pull forces completion on the axon runtime (where
    # block_until_ready does not wait for compute)
    timed = jax.jit(
        lambda *a: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(fn(*a))
        )
    )
    float(timed(*args))  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(timed(*args))
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
    batch_d = {"latents": lat, "input_ids": ids}

    # (d) CLIP encode alone
    timeit("clip encode", lambda p, i: clip.apply(p, i), clip_params, ids)

    # (b) grads only (grads are reduced to a scalar inside the program)
    def grads_only(params, cp, b, k):
        def loss(p):
            ctx = jax.lax.stop_gradient(clip.apply(cp, b["input_ids"]))
            k1, k2 = jax.random.split(k)
            noise = jax.random.normal(k1, b["latents"].shape, dtype)
            t = jax.random.randint(k2, (batch,), 0, schedule.noise_steps)
            from stable_diffusion_pytorch_tpu.models import schedule as S

            x_t = S.add_noise(schedule, b["latents"], noise, t)
            eps = unet.apply(p, x_t, t, ctx)
            return jnp.mean((eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)

        return jax.grad(loss)(params)

    timeit("unet fwd+bwd (grads only)", grads_only, unet_params, clip_params, batch_d, key)

    # (c) AdamW update alone: donate + chain the state like the real trainer
    # (params 3.4GB + mu/nu 6.8GB + zero grads 3.4GB resident; donation keeps
    # the new state in-place instead of doubling it). A/B: the optax chain
    # (clip -> adamw -> apply_updates, the --no-fused-adamw path) vs the fused
    # single-HBM-pass transform (default, trainers/fused_adamw.py).
    from stable_diffusion_pytorch_tpu.trainers.fused_adamw import fused_adamw
    from stable_diffusion_pytorch_tpu.trainers.steps import _optimizer_step

    param_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), unet_params
    )

    def fresh_zeros():
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), param_shapes
        )

    grads = fresh_zeros()
    del unet_params  # variant 1's donation would invalidate it anyway
    variants = {
        "optax chain (clip+adamw+apply, donated)": optax.chain(
            optax.clip_by_global_norm(0.1), tx
        ),
        "fused single-pass (donated)": fused_adamw(
            1e-4,
            weight_decay=1e-2,
            max_grad_norm=0.1,
            mu_dtype=jnp.bfloat16 if mu_dtype == "bf16" else None,
        ),
    }
    for name, vtx in variants.items():
        # fresh zero params per variant: the donated first call consumes the
        # state's param buffers, so they cannot be shared across variants
        state = TrainState.create(fresh_zeros(), vtx)

        def adam_only(s, g, vtx=vtx):
            new_params, new_opt = _optimizer_step(vtx, g, s.opt_state, s.params)
            probe = jnp.sum(
                jax.tree_util.tree_leaves(new_params)[0].astype(jnp.float32)
            )
            return TrainState(
                step=s.step + 1, params=new_params, opt_state=new_opt,
                ema_params=None,
            ), probe

        jit_adam = jax.jit(adam_only, donate_argnums=(0,))
        state, probe = jit_adam(state, grads)  # compile + warmup
        float(probe)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            state, probe = jit_adam(state, grads)
            float(probe)
            times.append(time.perf_counter() - t0)
        print(f"{name:44s} {min(times) * 1e3:9.2f} ms", flush=True)
        del state, jit_adam
    log("full train step: see tools/bench_train.py (donated, chained)")


if __name__ == "__main__":
    main()
