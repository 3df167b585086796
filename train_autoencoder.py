#!/usr/bin/env python
"""KL-VAE training entry point.

Counterpart of /root/reference/train_autoencoder.py:532-570: trains the
from-scratch AutoEncoderKL end-to-end with recon MSE + KL loss. The reference's
loss path is broken (it takes example 0's KL instead of the batch mean,
train_autoencoder.py:505 — README.md admits VAE training "does not quite
work"); the default here is the fixed batch-mean KL (BASELINE.json config #4),
with ``--kl-per-example0`` available for parity.

Example (tiny smoke run, CPU):
    JAX_PLATFORMS=cpu python train_autoencoder.py --dataset synthetic \
        --max-train-steps 3 --train-batch-size 2 --gradient-accumulation-steps 1 \
        --autoencoder-channels-list 16,32 --groups 8 --ckpt-dir /tmp/ckpt_vae
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

    import jax

    from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config
    from stable_diffusion_pytorch_tpu.models.autoencoder import AutoEncoderKL
    from stable_diffusion_pytorch_tpu.models.build import resolve_dtype
    from stable_diffusion_pytorch_tpu.models.clip import CLIPModel
    from stable_diffusion_pytorch_tpu.trainers.trainer import AutoencoderTrainer
    from stable_diffusion_pytorch_tpu.utils.data import get_dataset, sample_test_image
    from stable_diffusion_pytorch_tpu.utils.tracking import get_logger

    logger = get_logger("train_autoencoder")
    args, cfg = load_config(argv)
    compat = compat_from_cfg(cfg)
    if cfg.train.use_deepspeed:
        cfg.parallel.shard_optimizer_state = True

    dtype = resolve_dtype(cfg.parallel.mixed_precision)
    vae = AutoEncoderKL.from_config(cfg.model.autoencoder, compat=compat, dtype=dtype)
    import jax.numpy as jnp

    dummy = jnp.zeros(
        (1, cfg.dataset.resolution, cfg.dataset.resolution, cfg.model.autoencoder.in_channels),
        dtype,
    )
    vae_params = vae.init(jax.random.PRNGKey(cfg.train.seed), dummy)

    # standalone tokenizer, like train_autoencoder.py:536-541
    text_encoder = CLIPModel(cfg.model.clip, dtype=dtype)
    tokenizer = text_encoder.tokenizer

    train_dataset = get_dataset(cfg.dataset, split="train", tokenizer=tokenizer, logger=logger)
    eval_dataset = get_dataset(cfg.dataset, split="validation", tokenizer=tokenizer, logger=logger)
    test_images = sample_test_image(cfg.dataset, split="test", tokenizer=tokenizer, logger=logger, num=10)

    trainer = AutoencoderTrainer(
        vae, vae_params, cfg, train_dataset, eval_dataset,
        test_images=test_images, logger=logger, compat=compat,
    )
    trainer.train()


def main(argv=None):
    # per-host crash capture, the torch elastic @record analog
    from stable_diffusion_pytorch_tpu.utils.errors import record

    return record(_main)(argv)


if __name__ == "__main__":
    main()
