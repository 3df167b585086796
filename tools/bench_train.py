#!/usr/bin/env python
"""Training-step throughput bench: SD-1.5-scale UNet fine-tune samples/sec.

Measures the full jitted train step (CLIP encode + q-sample + UNet fwd/bwd with
the Pallas flash fwd+bwd kernels + AdamW) from cached latents at 512x512-scale
(64x64x4 latents), the "train_unet samples/sec" driver metric. Prints one JSON
line like bench.py.

Env: TB_BATCH (8), TB_REPEATS (5), TB_REMAT (0), TB_PRESET (sd15|reference),
TB_MU_DTYPE (f32|bf16) to A/B the AdamW first-moment dtype (HBM-traffic lever),
TB_NU_DTYPE (f32|bf16) same for the second moment (fused optimizer only),
TB_OPT (fused [default, matches the trainer] | optax | 8bit),
TB_ACCUM (1; >1 wraps the optimizer in gradient accumulation — fused ->
fused_accumulate, optax/8bit -> optax.MultiSteps — and times micro steps;
the trainer's default is 4, where MultiSteps streams a zero update through
all params on every non-sync micro step and the fused wrapper does not),
TB_CHAIN (1; k>1 scans k train steps inside one XLA program, the trainer's
--steps-per-dispatch path — isolates the runtime's per-dispatch/loss-sync
constants from the in-program step time).
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


def main():
    batch = int(os.environ.get("TB_BATCH", "8"))
    repeats = int(os.environ.get("TB_REPEATS", "5"))
    # "0"=off, "1"/"full"=per-block remat, "conv-save"/"dots_saveable"=
    # selective policies (models/unet.py remat field)
    remat_env = os.environ.get("TB_REMAT", "0")
    remat = {"0": False, "1": "full"}.get(remat_env, remat_env)
    preset = os.environ.get("TB_PRESET", "sd15")

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    unet_cfg = (
        presets.sd15_unet_config() if preset == "sd15" else presets.reference_unet_config()
    )
    lat = 64 if preset == "sd15" else 32

    unet = UNetModel.from_config(4, 32, unet_cfg, dtype=dtype, remat=remat)
    clip = CLIPTextTransformer(dtype=dtype)
    schedule = make_schedule(presets.sd15_ddpm_config())

    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(key, (batch, lat, lat, 4), jnp.float32)
    ids = jnp.zeros((batch, 77), jnp.int32)
    uncond = jnp.full((77,), 49407, jnp.int32)

    log(f"backend={jax.default_backend()} batch={batch} latent={lat} remat={remat}")
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

    mu_dtype = os.environ.get("TB_MU_DTYPE", "f32")
    if os.environ.get("TB_OPT") == "8bit":
        # int8 block-quantized moments: 4x less optimizer-state HBM traffic
        # in the (FLOP-free, bandwidth-bound) update phase
        from stable_diffusion_pytorch_tpu.trainers.adam8bit import adamw_8bit

        tx = optax.chain(
            optax.clip_by_global_norm(1.0), adamw_8bit(1e-5)
        )
    elif os.environ.get("TB_OPT") == "optax":
        # the --no-fused-adamw path (pre-round-3 default), kept for A/B
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(1e-5, mu_dtype=jnp.bfloat16 if mu_dtype == "bf16" else None),
        )
    else:
        # trainer default: single-HBM-pass fused clip+AdamW
        from stable_diffusion_pytorch_tpu.trainers.fused_adamw import fused_adamw

        tx = fused_adamw(
            1e-5,
            max_grad_norm=1.0,
            mu_dtype=jnp.bfloat16 if mu_dtype == "bf16" else None,
            nu_dtype=(
                jnp.bfloat16
                if os.environ.get("TB_NU_DTYPE", "f32") == "bf16"
                else None
            ),
        )
    accum = int(os.environ.get("TB_ACCUM", "1"))
    if accum > 1:
        if hasattr(tx, "apply"):
            from stable_diffusion_pytorch_tpu.trainers.fused_adamw import (
                fused_accumulate,
            )

            acc_dt = (
                jnp.bfloat16
                if os.environ.get("TB_ACCUM_DTYPE", "f32") == "bf16"
                else None
            )
            tx = fused_accumulate(tx, accum, acc_dtype=acc_dt)
        else:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        repeats = max(repeats, 2 * accum + 1)
    train_step, _ = make_unet_train_step(unet, clip, None, schedule, tx)
    jit_step = jax.jit(train_step, donate_argnums=(0,))
    state = TrainState.create(unet_params, tx)
    batch_dict = {"latents": latents, "input_ids": ids}

    log("compiling + warmup...")
    from bench import xla_flops  # repo-root bench.py: cost-analysis helper
    from stable_diffusion_pytorch_tpu.ops.attention import (
        attention_stats,
        reset_attention_stats,
    )

    reset_attention_stats()
    step_xla = xla_flops(
        jit_step.lower(state, clip_params, None, batch_dict, uncond, key).compile()
    )
    # Pallas flash kernels are invisible to XLA cost analysis; the dispatcher
    # records analytic FORWARD attention FLOPs at trace time, and the flash
    # backward costs 2.5x the forward (5 matmul passes vs 2, FlashAttention
    # accounting) -> total = 3.5x traced forward
    step_flash = attention_stats()["flash_flops"] * 3.5
    step_flops = step_xla + step_flash
    log(
        f"cost analysis: {step_flops / 1e12:.2f} TFLOP per train step "
        f"(xla {step_xla / 1e12:.2f} + flash fwd+bwd {step_flash / 1e12:.2f})"
    )
    # TB_CHAIN=k: lax.scan k train steps inside ONE XLA program (the trainer's
    # --steps-per-dispatch path) — isolates the runtime's per-dispatch +
    # loss-sync constants from the in-program step time. Reported step time is
    # chunk wall / k.
    chain_k = int(os.environ.get("TB_CHAIN", "1"))
    if chain_k > 1:
        def chained(state, cp, batch, unc, base_key):
            def body(s, i):
                s2, m = train_step(s, cp, None, batch, unc,
                                   jax.random.fold_in(base_key, i))
                return s2, m["loss"]
            return jax.lax.scan(body, state, jnp.arange(chain_k))

        jit_chain = jax.jit(chained, donate_argnums=(0,))

    t0 = time.time()
    if chain_k > 1:
        state, losses = jit_chain(state, clip_params, batch_dict, uncond, key)
        float(jnp.sum(losses))
    else:
        state, metrics = jit_step(state, clip_params, None, batch_dict, uncond, key)
        float(metrics["loss"])
    log(f"warmup {time.time() - t0:.1f}s")

    times = []
    for i in range(repeats):
        t0 = time.time()
        if chain_k > 1:
            state, losses = jit_chain(
                state, clip_params, batch_dict, uncond, jax.random.fold_in(key, i)
            )
            float(jnp.sum(losses))  # one host pull per CHUNK
            dt = (time.time() - t0) / chain_k
        else:
            state, metrics = jit_step(
                state, clip_params, None, batch_dict, uncond,
                jax.random.fold_in(key, i),
            )
            float(metrics["loss"])  # host pull forces completion
            dt = time.time() - t0
        times.append(dt)
        log(f"step {i}: {dt * 1e3:.1f} ms -> {batch / dt:.2f} samples/sec")

    if accum > 1:
        # micro-step mix: average over the last full accumulation windows so
        # sync and non-sync steps are weighted k-1 : 1 as in real training
        window = times[-(2 * accum):]
        p50 = sum(window) / len(window)
    else:
        times.sort()
        p50 = times[len(times) // 2]
    out = {
        "metric": f"train_unet_{preset}_samples_per_sec_per_chip",
        "value": round(batch / p50, 4),
        "unit": "samples/sec/chip",
        "step_ms_p50": round(p50 * 1e3, 2),
    }
    if accum > 1:
        out["metric"] += f"_accum{accum}"
        out["step_ms_p50"] = None
        out["micro_step_ms_mean"] = round(p50 * 1e3, 2)
    if chain_k > 1:
        out["metric"] += f"_chain{chain_k}"
    if step_flops > 0:
        from bench import V5E_PEAK_BF16_TFLOPS

        achieved = step_flops / p50 / 1e12
        out["tflops_per_sec"] = round(achieved, 2)
        if jax.default_backend() == "tpu":
            out["mfu_pct"] = round(100.0 * achieved / V5E_PEAK_BF16_TFLOPS, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
