#!/usr/bin/env python
"""Latent-diffusion UNet fine-tuning entry point.

Counterpart of /root/reference/train_unet.py:568-595: build models (frozen CLIP
text encoder + frozen VAE + trainable UNet), load train/validation datasets,
run the data-parallel trainer. Distribution is a JAX data mesh with XLA
collectives instead of accelerate/NCCL; ``--use-deepspeed`` is accepted for CLI
parity and maps to ``--shard-optimizer-state`` (the ZeRO-2 analog).

Like the reference (train_unet.py:68-73), the VAE used here is FROZEN: when
pretrained SD-1.5 VAE weights are available locally they should be loaded into
the autoencoder (offline environments fall back to the randomly initialized
from-scratch VAE — functional, but latents are untrained; see README).

Example (tiny smoke run, CPU):
    JAX_PLATFORMS=cpu python train_unet.py --dataset synthetic \
        --max-train-steps 3 --train-batch-size 2 --gradient-accumulation-steps 1 \
        --channels-list 32,64 --n-heads 4 --time-emb-dim 64 --n-layers 1 \
        --autoencoder-channels-list 16,32 --groups 8 --ckpt-dir /tmp/ckpt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.platform import (
        enable_compilation_cache,
        ensure_platform,
    )

    ensure_platform()
    enable_compilation_cache()

    # multi-host pods: join the global runtime (no-op single host)
    from stable_diffusion_pytorch_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()

    from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models, resolve_dtype
    from stable_diffusion_pytorch_tpu.trainers.trainer import UNetTrainer
    from stable_diffusion_pytorch_tpu.utils.data import get_dataset
    from stable_diffusion_pytorch_tpu.utils.tracking import get_logger

    logger = get_logger("train_unet")
    args, cfg = load_config(argv)
    compat = compat_from_cfg(cfg)
    if cfg.train.use_deepspeed:
        logger.info(
            "--use-deepspeed requested: mapping to optimizer-state sharding "
            "over the data mesh (ZeRO-2 analog)"
        )
        cfg.parallel.shard_optimizer_state = True

    dtype = resolve_dtype(cfg.parallel.mixed_precision)
    model = build_models(
        cfg.model, logger=logger, compat=compat, dtype=dtype, seed=cfg.train.seed,
        init_image_size=cfg.dataset.resolution,
        remat=cfg.parallel.remat_policy,
    )
    train_dataset = get_dataset(
        cfg.dataset, split="train", tokenizer=model.text_encoder.tokenizer, logger=logger
    )
    eval_dataset = get_dataset(
        cfg.dataset, split="validation", tokenizer=model.text_encoder.tokenizer,
        logger=logger,
    )

    collate = None
    if cfg.dataset.latent_cache:
        # BASELINE config #5: encode once, train from cached latents
        import os as _os

        from stable_diffusion_pytorch_tpu.utils.latent_cache import (
            LatentCacheDataset,
            build_latent_cache,
            collate_latents,
        )

        if not _os.path.exists(cfg.dataset.latent_cache):
            build_latent_cache(
                model.autoencoder,
                model.autoencoder_params,
                train_dataset,
                cfg.dataset.latent_cache,
                logger=logger,
                text_encoder=model.text_encoder,  # also cache CLIP embeddings
            )
        train_dataset = LatentCacheDataset(cfg.dataset.latent_cache)
        collate = collate_latents
        logger.info(f"training from cached latents: {cfg.dataset.latent_cache}")

    trainer = UNetTrainer(
        model, cfg, train_dataset, eval_dataset, logger=logger, compat=compat,
        train_collate=collate,
    )
    trainer.train()


def main(argv=None):
    # per-host crash capture, the torch elastic @record analog
    from stable_diffusion_pytorch_tpu.utils.errors import record

    return record(_main)(argv)


if __name__ == "__main__":
    main()
