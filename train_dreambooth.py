#!/usr/bin/env python
"""DreamBooth fine-tuning entry point (Ruiz et al. 2022, "DreamBooth: Fine
Tuning Text-to-Image Diffusion Models for Subject-Driven Generation").

No counterpart in /root/reference — capability extension; the ecosystem analog
is diffusers' train_dreambooth.py. Fine-tunes the UNet (optionally as LoRA via
``--lora-rank``) on a handful of subject images captioned with an
identifier prompt ("a photo of sks dog"). With ``--with-prior-preservation``
each batch interleaves generated class images ("a photo of a dog") and the
loss adds ``--prior-loss-weight`` x MSE(class) to fight identifier drift —
note the effective per-step batch is then 2 x ``--train-batch-size``.

Example (tiny smoke run, CPU):
    JAX_PLATFORMS=cpu python train_dreambooth.py \
        --instance-data-dir data/my_dog --instance-prompt "a photo of sks dog" \
        --with-prior-preservation --class-data-dir data/dog_class \
        --class-prompt "a photo of a dog" --num-class-images 8 \
        --max-train-steps 400 --ckpt-dir model/dreambooth
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def ensure_class_images(model, cfg_train, resolution: int, logger) -> None:
    """Generate missing prior-preservation images with the CURRENT model
    (Ruiz et al. 2022 §3.2: the prior is the model's own class distribution)."""
    folder = cfg_train.class_data_dir
    os.makedirs(folder, exist_ok=True)
    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    have = sorted(f for f in os.listdir(folder) if f.lower().endswith(exts))
    need = cfg_train.num_class_images - len(have)
    if need <= 0:
        logger.info(
            f"prior preservation: {len(have)} class images present in {folder!r}"
        )
        return
    logger.info(
        f"prior preservation: generating {need} class image(s) for "
        f"{cfg_train.class_prompt!r} into {folder!r} "
        f"({cfg_train.class_sampling_steps} DDIM steps)"
    )
    from stable_diffusion_pytorch_tpu.pipeline import sample

    batch = 4
    done = 0
    while done < need:
        n = min(batch, need - done)
        outs = sample(
            model,
            image_size=resolution,
            prompt=[cfg_train.class_prompt] * n,
            time_steps=cfg_train.class_sampling_steps,
            guidance_scale=cfg_train.guidance_scale,
            save_dir=None,
            sampler="ddim",
            seed=[cfg_train.seed + len(have) + done + i for i in range(n)],
        )
        from PIL import Image

        for i, img in enumerate(outs):
            Image.fromarray(img).save(
                os.path.join(folder, f"class_{len(have) + done + i:05d}.png")
            )
        done += n


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
    from stable_diffusion_pytorch_tpu.trainers.trainer import UNetTrainer
    from stable_diffusion_pytorch_tpu.utils.data import (
        DreamBoothDataset,
        FolderPromptDataset,
        dreambooth_collate,
    )
    from stable_diffusion_pytorch_tpu.utils.tracking import get_logger

    logger = get_logger("train_dreambooth")
    args, cfg = load_config(argv)
    compat = compat_from_cfg(cfg)
    assert cfg.train.instance_data_dir, "--instance-data-dir is required"

    dtype = resolve_dtype(cfg.parallel.mixed_precision)
    model = build_models(
        cfg.model, logger=logger, compat=compat, dtype=dtype, seed=cfg.train.seed,
        init_image_size=cfg.dataset.resolution,
        remat=cfg.parallel.remat_policy,
    )
    tokenizer = model.text_encoder.tokenize

    instance_ds = FolderPromptDataset(
        cfg.train.instance_data_dir, cfg.train.instance_prompt, cfg.dataset,
        tokenizer,
    )
    logger.info(
        f"DreamBooth: {len(instance_ds)} instance image(s), prompt "
        f"{cfg.train.instance_prompt!r}"
    )

    collate = None
    train_dataset = instance_ds
    if cfg.train.with_prior_preservation:
        assert cfg.train.class_data_dir, (
            "--with-prior-preservation needs --class-data-dir"
        )
        ensure_class_images(model, cfg.train, cfg.dataset.resolution, logger)
        class_ds = FolderPromptDataset(
            cfg.train.class_data_dir, cfg.train.class_prompt, cfg.dataset,
            tokenizer,
        )
        train_dataset = DreamBoothDataset(instance_ds, class_ds)
        collate = dreambooth_collate
        logger.info(
            f"prior preservation on: {len(class_ds)} class image(s), weight "
            f"{cfg.train.prior_loss_weight:g} (effective batch "
            f"{2 * cfg.train.train_batch_size}/device)"
        )

    trainer = UNetTrainer(
        model, cfg, train_dataset, instance_ds, logger=logger, compat=compat,
        train_collate=collate,
    )
    trainer.train()


def main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.errors import record

    return record(_main)(argv)


if __name__ == "__main__":
    main()
