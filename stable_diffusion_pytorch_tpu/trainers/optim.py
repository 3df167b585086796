"""Optimizer + LR schedule construction (optax).

Counterpart of the reference's optimizer/scheduler setup
(/root/reference/train_unet.py:208-259): AdamW with weight decay, global-norm
gradient clipping, a warmup LR schedule, and gradient accumulation.

Semantics notes:
- The reference steps its HF scheduler once per *micro* step and compensates by
  multiplying warmup/total steps by grad_accum (train_unet.py:245-252). Here
  ``optax.MultiSteps`` advances the inner optimizer once per *optimizer* step,
  so warmup/total are used directly — the LR trajectory per optimizer step is
  identical.
- ``use_8bit_adam`` (bitsandbytes, CUDA-only in the reference) selects the
  true TPU-native 8-bit optimizer: int8 block-quantized moments
  (trainers/adam8bit.py, ~4x optimizer-state memory reduction). A milder
  option remains: ``--adam-mu-dtype bf16`` stores only the first moment in
  bf16 while keeping update math in f32.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def build_lr_schedule(
    scheduler_type: str,
    learning_rate: float,
    warmup_steps: int,
    total_steps: int,
) -> optax.Schedule:
    """HF transformers get_scheduler equivalents (train_unet.py:245-252)."""
    warmup = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
    decay_steps = max(total_steps - warmup_steps, 1)
    if scheduler_type == "linear":
        decay = optax.linear_schedule(learning_rate, 0.0, decay_steps)
    elif scheduler_type == "cosine":
        decay = optax.cosine_decay_schedule(learning_rate, decay_steps)
    elif scheduler_type == "constant_with_warmup":
        decay = optax.constant_schedule(learning_rate)
    elif scheduler_type == "constant":
        return optax.constant_schedule(learning_rate)
    elif scheduler_type == "polynomial":
        decay = optax.polynomial_schedule(learning_rate, 0.0, power=1.0, transition_steps=decay_steps)
    else:
        raise ValueError(f"unknown scheduler_type {scheduler_type!r}")
    return optax.join_schedules([warmup, decay], [warmup_steps])


def build_optimizer(
    optim_cfg,
    max_train_steps: int,
    gradient_accumulation_steps: int = 1,
    mesh=None,
) -> optax.GradientTransformation:
    """clip-by-global-norm -> AdamW(schedule, wd), accumulated over k micro-steps
    (train_unet.py:208-236, 359).

    ``mesh``: pass the trainer's data mesh when the optimizer state is
    ZeRO-sharded, so the 8-bit optimizer can run its fused Pallas update
    kernel per-shard via shard_map (trainers/adam8bit.py)."""
    schedule = build_lr_schedule(
        optim_cfg.scheduler_type,
        optim_cfg.learning_rate,
        optim_cfg.lr_warmup_steps,
        max_train_steps,
    )
    if getattr(optim_cfg, "use_8bit_adam", False):
        # true 8-bit optimizer state (int8 block-quantized moments), the
        # reference's bitsandbytes AdamW8bit analog (train_unet.py:210-218)
        from stable_diffusion_pytorch_tpu.trainers.adam8bit import adamw_8bit

        tx = optax.chain(
            optax.clip_by_global_norm(optim_cfg.max_grad_norm),
            adamw_8bit(
                learning_rate=schedule,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=optim_cfg.adam_weight_decay,
                mesh=mesh,
            ),
        )
        if gradient_accumulation_steps > 1:
            # compose via fused_accumulate, NOT optax.MultiSteps: MultiSteps
            # keeps an f32 accumulator AND streams a zero update through all
            # params every non-sync micro step — measured to OOM SD-1.5-scale
            # HBM even at batch 2 (docs/PERFORMANCE.md), which would defeat
            # the 8-bit flag's whole purpose. fused_accumulate touches only
            # the accumulator off-sync and honors --accum-dtype bf16.
            from stable_diffusion_pytorch_tpu.trainers.fused_adamw import (
                as_fused_apply,
                fused_accumulate,
            )

            acc_bf16 = getattr(optim_cfg, "accum_dtype", "f32") == "bf16"
            return fused_accumulate(
                as_fused_apply(tx),
                gradient_accumulation_steps,
                acc_dtype=jnp.bfloat16 if acc_bf16 else None,
            )
        return tx
    use_bf16_mu = getattr(optim_cfg, "adam_mu_dtype", "f32") == "bf16"
    use_bf16_nu = getattr(optim_cfg, "adam_nu_dtype", "f32") == "bf16"
    if use_bf16_nu and getattr(optim_cfg, "no_fused_adamw", False):
        raise ValueError(
            "--adam-nu-dtype bf16 requires the fused AdamW path "
            "(optax.adamw has no nu storage dtype); drop --no-fused-adamw"
        )
    if not getattr(optim_cfg, "no_fused_adamw", False):
        # default: single-HBM-pass fused clip+AdamW (trainers/fused_adamw.py);
        # bit-identical f32 math to the optax chain below. Sync-step speed is
        # a wash (XLA fuses the chain too; both ~40ms at ~600GB/s on the
        # SD-1.5 tree), but under gradient accumulation the fused wrapper
        # skips MultiSteps' params-wide zero-update stream on non-sync
        # micro steps
        from stable_diffusion_pytorch_tpu.trainers.fused_adamw import (
            fused_accumulate,
            fused_adamw,
        )

        ftx = fused_adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=optim_cfg.adam_weight_decay,
            max_grad_norm=optim_cfg.max_grad_norm,
            mu_dtype="bfloat16" if use_bf16_mu else None,
            nu_dtype="bfloat16" if use_bf16_nu else None,
        )
        if gradient_accumulation_steps > 1:
            acc_bf16 = getattr(optim_cfg, "accum_dtype", "f32") == "bf16"
            return fused_accumulate(
                ftx,
                gradient_accumulation_steps,
                acc_dtype=jnp.bfloat16 if acc_bf16 else None,
            )
        return ftx
    tx = optax.chain(
        optax.clip_by_global_norm(optim_cfg.max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=optim_cfg.adam_weight_decay,
            # bf16 first moment: milder memory-lean option; update math stays f32
            mu_dtype="bfloat16" if use_bf16_mu else None,
        ),
    )
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx


def lr_at_step(optim_cfg, max_train_steps: int, opt_step: int) -> float:
    """Host-side LR readout for logging (train_unet.py:381-388)."""
    schedule = build_lr_schedule(
        optim_cfg.scheduler_type,
        optim_cfg.learning_rate,
        optim_cfg.lr_warmup_steps,
        max_train_steps,
    )
    return float(schedule(opt_step))
