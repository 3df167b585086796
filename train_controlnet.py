#!/usr/bin/env python
"""ControlNet training entry point (Zhang et al. 2023, "Adding Conditional
Control to Text-to-Image Diffusion Models").

No counterpart in /root/reference — capability extension; the ecosystem analog
is diffusers' train_controlnet.py. Trains a control branch (a copy of the UNet
encoder + hint embedding + zero convs; models/controlnet.py) on (image, hint,
caption) triples while the UNet/VAE/CLIP stay frozen. The default hint is a
Sobel edge map computed from the target image (utils/data.py:edge_hint) — the
offline stand-in for Canny conditioning. Sample with the result via
``scripts/txt2img.py --controlnet-checkpoint ... --control-image ...``.

Example (tiny smoke run, CPU):
    JAX_PLATFORMS=cpu python train_controlnet.py --dataset synthetic \
        --max-train-steps 3 --train-batch-size 2 --cfg-dropout-prob 0.5 \
        --channels-list 32,64 --n-heads 4 --time-emb-dim 64 --n-layers 1 \
        --autoencoder-channels-list 16,32 --groups 8 --ckpt-dir /tmp/cn_ckpt
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

    from stable_diffusion_pytorch_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()

    from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models, resolve_dtype
    from stable_diffusion_pytorch_tpu.models.controlnet import ControlNet
    from stable_diffusion_pytorch_tpu.trainers.trainer import ControlNetTrainer
    from stable_diffusion_pytorch_tpu.utils.data import (
        ControlNetDataset,
        get_dataset,
    )
    from stable_diffusion_pytorch_tpu.utils.tracking import get_logger

    logger = get_logger("train_controlnet")
    args, cfg = load_config(argv)
    compat = compat_from_cfg(cfg)

    dtype = resolve_dtype(cfg.parallel.mixed_precision)
    model = build_models(
        cfg.model, logger=logger, compat=compat, dtype=dtype, seed=cfg.train.seed,
        init_image_size=cfg.dataset.resolution,
        remat=cfg.parallel.remat_policy,
    )
    # the hint conv stack must bridge pixel -> latent resolution: one stride-2
    # per VAE downsample
    hint_downsamples = len(cfg.model.autoencoder.autoencoder_channels_list) - 1
    controlnet = ControlNet.from_unet_config(
        model.unet.latent_channels,
        cfg.model.autoencoder.groups,
        cfg.model.unet,
        hint_downsamples=hint_downsamples,
        compat=compat,
        dtype=dtype,
    )
    logger.info(
        f"ControlNet: UNet-encoder copy + hint embedding "
        f"({hint_downsamples} hint downsamples), prompt dropout "
        f"{getattr(cfg.train, 'cfg_dropout_prob', 0.5):g}"
    )

    base_train = get_dataset(
        cfg.dataset, split="train", tokenizer=model.text_encoder.tokenizer,
        logger=logger,
    )
    base_eval = get_dataset(
        cfg.dataset, split="validation", tokenizer=model.text_encoder.tokenizer,
        logger=logger,
    )
    train_dataset = ControlNetDataset(base_train)
    eval_dataset = ControlNetDataset(base_eval)

    trainer = ControlNetTrainer(
        model, controlnet, cfg, train_dataset, eval_dataset, logger=logger,
    )
    trainer.train()


def main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.errors import record

    return record(_main)(argv)


if __name__ == "__main__":
    main()
