#!/usr/bin/env python
"""Benchmark: 512x512 50-step DDIM txt2img throughput, images/sec/chip.

Measures the full jitted pipeline — CFG-doubled UNet reverse loop (lax.scan)
plus f8 VAE decode — on an SD-1.5-scale stack (860M-param UNet) in bf16, the
workload BASELINE.json's north star is defined on ("≥2x A100 images/sec/chip at
512x512 50-step DDIM"). The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is computed against the widely reported A100 fp16 SD-1.5
50-step DDIM throughput of ~0.52 images/sec; vs_baseline >= 2.0 meets the
target.

Prints exactly ONE JSON line on stdout; progress goes to stderr.

Env knobs: BENCH_BATCH (4), BENCH_STEPS (50), BENCH_RES (512), BENCH_REPEATS (3),
BENCH_PRESET (sd15|reference), BENCH_SKIP_DECODE (0), BENCH_SAMPLER (ddim|ddpm|
dpmpp; ddim is the headline metric), BENCH_DEEP_CACHE (0; N>1 enables DeepCache
trunk reuse every N steps — opt-in approximate mode, NOT the headline
configuration).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REF_IMAGES_PER_SEC = 0.52  # published A100 fp16 SD1.5 DDIM-50 throughput
V5E_PEAK_BF16_TFLOPS = 197.0  # TPU v5e per-chip bf16 peak (public spec)


def xla_flops(compiled) -> float:
    """Total FLOPs of a compiled XLA executable per execution, from the
    compiler's cost analysis (0.0 when the backend doesn't report it)."""
    try:
        costs = compiled.cost_analysis()
        if isinstance(costs, (list, tuple)):  # some backends return [dict]
            costs = costs[0]
        return float(costs.get("flops", 0.0))
    except Exception:
        return 0.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from stable_diffusion_pytorch_tpu.utils.platform import (
        enable_compilation_cache,
        ensure_platform,
    )

    ensure_platform()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    # Device-attach watchdog: the tunneled TPU backend blocks FOREVER inside
    # jax.devices() when the relay is down (observed: 20+ min hangs). Probe
    # the attach on a daemon thread with a hard deadline so the bench fails
    # loudly (exit 3 + stderr diagnostic) instead of hanging the driver.
    import threading

    attach = {}

    def _probe():
        try:
            attach["devices"] = jax.devices()
        except Exception as e:  # surface backend-init errors as a clean fail
            attach["error"] = repr(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout=float(os.environ.get("BENCH_ATTACH_TIMEOUT_S", "600")))
    if t.is_alive():
        log("FATAL: device attach did not complete within the watchdog "
            "deadline — the TPU tunnel/relay looks down. Set "
            "BENCH_ATTACH_TIMEOUT_S to adjust.")
        os._exit(3)
    if "error" in attach:
        log(f"FATAL: device attach failed: {attach['error']}")
        os._exit(3)
    log(f"devices: {attach['devices']}")

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    res = int(os.environ.get("BENCH_RES", "512"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    preset = os.environ.get("BENCH_PRESET", "sd15")
    skip_decode = os.environ.get("BENCH_SKIP_DECODE", "0") == "1"

    from stable_diffusion_pytorch_tpu.models import presets
    from stable_diffusion_pytorch_tpu.models.autoencoder import AutoEncoderKL
    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn
    from stable_diffusion_pytorch_tpu.models.schedule import make_schedule
    from stable_diffusion_pytorch_tpu.models.unet import UNetModel

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    log(f"backend={backend} dtype={dtype.__name__} batch={batch} steps={steps} res={res}")

    if preset == "sd15":
        unet_cfg = presets.sd15_unet_config()
        vae_cfg = presets.sd15_autoencoder_config()
    else:
        unet_cfg = presets.reference_unet_config()
        vae_cfg = presets.sd15_autoencoder_config()
    ddpm_cfg = presets.sd15_ddpm_config()

    unet = UNetModel.from_config(vae_cfg.latent_channels, vae_cfg.groups, unet_cfg, dtype=dtype)
    vae = AutoEncoderKL.from_config(vae_cfg, dtype=dtype)
    schedule = make_schedule(ddpm_cfg)

    f = 2 ** (len(vae_cfg.autoencoder_channels_list) - 1)
    latent_hw = res // f
    key = jax.random.PRNGKey(0)

    # param init via eval_shape + normal fill (cheap, shapes only)
    x = jnp.zeros((batch, latent_hw, latent_hw, vae_cfg.latent_channels), dtype)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, 768), dtype)
    log("initializing params...")
    unet_shapes = jax.eval_shape(lambda: unet.init(key, x, t, ctx))
    unet_params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), unet_shapes
    )
    if not skip_decode:
        vae_shapes = jax.eval_shape(lambda: vae.init(key, jnp.zeros((1, res, res, 3), dtype)))
        vae_params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), vae_shapes
        )

    deep_cache = int(os.environ.get("BENCH_DEEP_CACHE", "0"))
    if deep_cache > 1:
        log(f"DeepCache ON: trunk refresh every {deep_cache} steps (opt-in mode)")
    # BENCH_SAMPLER: ddim (the headline metric) | ddpm | dpmpp — BASELINE
    # config #2 names DDIM and DDPM; dpmpp backs the quality-vs-steps claim
    sampler = os.environ.get("BENCH_SAMPLER", "ddim")
    sample_fn = make_sample_fn(
        unet, schedule, steps, sampler=sampler, guidance_scale=7.5,
        deep_cache_interval=deep_cache,
    )

    # each pipeline also returns a f32 scalar checksum: pulling it to host
    # (float()) forces execution to complete — on this remote TPU runtime
    # block_until_ready alone does not wait for compute
    if skip_decode:
        def pipeline(unet_params, x_T, ctx, uncond, k):
            out = sample_fn(unet_params, x_T, ctx, uncond, k)
            return out, jnp.sum(out.astype(jnp.float32))
    else:
        def pipeline(unet_params, vae_params, x_T, ctx, uncond, k):
            x0 = sample_fn(unet_params, x_T, ctx, uncond, k)
            out = vae.apply(vae_params, x0, method=vae.decode)
            return out, jnp.sum(out.astype(jnp.float32))

    jit_pipeline = jax.jit(pipeline)
    x_T = jax.random.normal(key, x.shape, dtype)
    uncond = jnp.zeros_like(ctx)

    args = (unet_params, x_T, ctx, uncond, key) if skip_decode else (
        unet_params, vae_params, x_T, ctx, uncond, key
    )

    # Roofline accounting (MFU = achieved TFLOP/s over the 197 TFLOP/s v5e
    # bf16 peak). Two cost-analysis traps handled here: (1) XLA counts a
    # lax.scan body ONCE, not x steps — so the single denoise step is lowered
    # standalone and multiplied by the step count; (2) Pallas custom calls are
    # opaque to cost analysis — the dispatch layer accumulates analytic
    # QK^T/PV FLOPs for the flash path (ops/attention.py: flash_flops).
    from stable_diffusion_pytorch_tpu.models.latent_diffusion import (
        make_pred_noise_fn,
    )
    from stable_diffusion_pytorch_tpu.ops.attention import (
        attention_stats,
        reset_attention_stats,
    )

    log("lowering single denoise step + decode for cost analysis...")
    denoise = make_pred_noise_fn(unet, guidance_scale=7.5)
    reset_attention_stats()
    step_xla = xla_flops(
        jax.jit(denoise).lower(unet_params, x, t, ctx, ctx).compile()
    )
    step_flash = attention_stats()["flash_flops"]
    decode_flops = 0.0
    if not skip_decode:
        reset_attention_stats()
        decode_flops = xla_flops(
            jax.jit(
                lambda p, z: vae.apply(p, z, method=vae.decode)
            ).lower(vae_params, x).compile()
        ) + attention_stats()["flash_flops"]
    pipeline_flops = steps * (step_xla + step_flash) + decode_flops
    log(
        f"cost analysis: step {(step_xla + step_flash) / 1e12:.3f} TFLOP "
        f"(xla {step_xla / 1e12:.3f} + flash {step_flash / 1e12:.3f}), "
        f"decode {decode_flops / 1e12:.3f} TFLOP, "
        f"pipeline total {pipeline_flops / 1e12:.1f} TFLOP"
    )
    reset_attention_stats()  # the warmup assertion below counts afresh

    log("compiling + warmup run...")
    t0 = time.time()
    out, checksum = jit_pipeline(*args)
    float(checksum)
    log(f"warmup done in {time.time() - t0:.1f}s; output {out.shape}")

    stats = attention_stats()
    log(f"attention dispatch (trace-time): {stats}")
    if backend == "tpu":
        # the headline number is only valid on the flash path; a silent
        # Pallas->XLA fallback would quietly cost ~40% (VERDICT r2 weak #3)
        assert stats["flash"] > 0 and stats["fallback"] == 0, (
            f"flash attention path not taken on TPU: {stats}"
        )

    times = []
    for i in range(repeats):
        t0 = time.time()
        out, checksum = jit_pipeline(*args)
        float(checksum)
        dt = time.time() - t0
        times.append(dt)
        log(f"run {i}: {dt:.3f}s -> {batch / dt:.3f} images/sec")

    times.sort()
    p50 = times[len(times) // 2]
    images_per_sec = batch / p50
    result = {
        "metric": f"txt2img_{res}_{sampler}{steps}_images_per_sec_per_chip",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / A100_REF_IMAGES_PER_SEC, 4),
    }
    if pipeline_flops > 0 and deep_cache <= 1:
        # DeepCache skips the UNet trunk on most steps, so steps*step_flops
        # would overstate executed FLOPs — no MFU claim for the opt-in mode
        achieved = pipeline_flops / p50 / 1e12
        result["tflops_per_sec"] = round(achieved, 2)
        result["flop_breakdown_tflop"] = {
            "denoise_step_xla": round(step_xla / 1e12, 4),
            "denoise_step_flash_attn": round(step_flash / 1e12, 4),
            "steps": steps,
            "vae_decode": round(decode_flops / 1e12, 4),
        }
        if backend == "tpu":
            result["mfu_pct"] = round(100.0 * achieved / V5E_PEAK_BF16_TFLOPS, 2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
