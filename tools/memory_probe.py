#!/usr/bin/env python
"""Per-device HBM measurement: optimizer-state memory under f32 / 8-bit /
host-offload configurations (VERDICT r2: "measure, don't assert").

Runs ONE SD-1.5-scale train step per configuration on the real chip and
records ``device.memory_stats()`` (live + peak bytes) plus the analytic
optimizer-state size. Prints one JSON line per configuration.

Env: MP_BATCH (8), MP_CONFIGS (comma list of f32,8bit,offload,bf16mu).
On CPU the memory_stats numbers are null (backend doesn't report) but the
step still runs, so the tool is smoke-testable offline.
"""

import json
import os
import sys

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
from stable_diffusion_pytorch_tpu.parallel import mesh as mesh_lib  # noqa: E402
from stable_diffusion_pytorch_tpu.trainers.steps import (  # noqa: E402
    TrainState,
    make_unet_train_step,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def mem_stats():
    try:
        s = jax.local_devices()[0].memory_stats()
        if not s:
            return None
        return {
            "bytes_in_use": int(s.get("bytes_in_use", 0)),
            "peak_bytes_in_use": int(s.get("peak_bytes_in_use", 0)),
        }
    except Exception:
        return None


def tree_bytes(tree) -> int:
    return sum(
        l.size * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(tree)
        if hasattr(l, "dtype")
    )


def main():
    batch = int(os.environ.get("MP_BATCH", "8"))
    configs = os.environ.get("MP_CONFIGS", "f32,8bit,offload").split(",")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    unet = UNetModel.from_config(4, 32, presets.sd15_unet_config(), dtype=dtype)
    clip = CLIPTextTransformer(dtype=dtype)
    schedule = make_schedule(presets.sd15_ddpm_config())
    mesh = mesh_lib.get_mesh()

    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(key, (batch, 64, 64, 4), jnp.float32)
    ids = jnp.zeros((batch, 77), jnp.int32)
    uncond = jnp.full((77,), 49407, jnp.int32)

    unet_shapes = jax.eval_shape(
        lambda: unet.init(
            key, latents[:1].astype(dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 768), dtype),
        )
    )
    unet_params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), unet_shapes
    )
    clip_shapes = jax.eval_shape(lambda: clip.init(key, ids[:1]))
    clip_params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), clip_shapes
    )

    for cfg_name in configs:
        offload = cfg_name == "offload"
        if cfg_name == "8bit":
            from stable_diffusion_pytorch_tpu.trainers.adam8bit import adamw_8bit

            tx = optax.chain(optax.clip_by_global_norm(1.0), adamw_8bit(1e-5))
        elif cfg_name == "bf16mu":
            tx = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(1e-5, mu_dtype=jnp.bfloat16),
            )
        else:
            tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-5))

        train_step, _ = make_unet_train_step(unet, clip, None, schedule, tx)
        state = TrainState.create(unet_params, tx)
        opt_bytes = tree_bytes(state.opt_state)
        dev_sh = jax.tree_util.tree_map(
            lambda _: mesh_lib.replicated(mesh), state.opt_state
        )
        if offload:
            host_sh = mesh_lib.host_offload_shardings(dev_sh)
            state = TrainState(
                step=state.step,
                params=state.params,
                opt_state=jax.device_put(state.opt_state, host_sh),
            )

            def step_fn(state, *args):
                state = state.replace(
                    opt_state=jax.device_put(state.opt_state, dev_sh)
                )
                return train_step(state, *args)

        else:
            step_fn = train_step

        jit_step = jax.jit(step_fn, donate_argnums=(0,))
        import time

        t0 = time.time()
        new_state, metrics = jit_step(
            state, clip_params, None,
            {"latents": latents, "input_ids": ids}, uncond, key,
        )
        loss = float(metrics["loss"])
        warm = time.time() - t0
        if offload:
            new_state = new_state.replace(
                opt_state=jax.device_put(new_state.opt_state, host_sh)
            )
        t0 = time.time()
        new_state, metrics = jit_step(
            new_state, clip_params, None,
            {"latents": latents, "input_ids": ids}, uncond, key,
        )
        loss = float(metrics["loss"])
        step_s = time.time() - t0
        if offload:  # steady state between steps: moments evicted to host
            new_state = new_state.replace(
                opt_state=jax.device_put(new_state.opt_state, host_sh)
            )
            jax.block_until_ready(new_state.opt_state)
        stats = mem_stats()
        print(
            json.dumps(
                {
                    "metric": "train_memory_probe",
                    "config": cfg_name,
                    "batch": batch,
                    "opt_state_bytes": opt_bytes,
                    "device_memory": stats,
                    "step_ms": round(step_s * 1e3, 1),
                    "warmup_s": round(warm, 1),
                    "loss_finite": bool(loss == loss),
                }
            ),
            flush=True,
        )
        del state, new_state, jit_step


if __name__ == "__main__":
    main()
