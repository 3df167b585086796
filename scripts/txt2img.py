#!/usr/bin/env python
"""txt2img CLI: build the models and sample an image for a prompt.

Counterpart of /root/reference/scripts/txt2img.py:51-54 with a real flag surface
(the reference hardcodes prompt/steps in ``__main__``). Runs on TPU when
available, CPU otherwise (BASELINE.json config #1 is explicitly CPU-runnable).

Examples:
    python scripts/txt2img.py --prompt "a cat" --image-size 64 --sampling-steps 50
    python scripts/txt2img.py --sampler ddpm --reference-compat   # parity mode
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger("txt2img")


def main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.platform import ensure_platform

    ensure_platform()
    from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models, resolve_dtype
    from stable_diffusion_pytorch_tpu.ops.attention import set_attention_impl
    from stable_diffusion_pytorch_tpu.pipeline import SamplingConfig, sample

    args, cfg = load_config(argv, extra_data_classes=[SamplingConfig])
    compat = compat_from_cfg(cfg)
    if not cfg.parallel.use_pallas_attention:
        set_attention_impl("xla")

    dtype = resolve_dtype(cfg.parallel.mixed_precision)
    model = build_models(
        cfg.model,
        logger=logger,
        compat=compat,
        dtype=dtype,
        seed=cfg.train.seed,
        init_image_size=cfg.sampling.image_size,
    )
    if cfg.sampling.unet_checkpoint:
        import os as _os

        from stable_diffusion_pytorch_tpu.utils.checkpoint import (
            find_latest_checkpoint,
            load_params_for_inference,
        )

        path = cfg.sampling.unet_checkpoint
        if _os.path.isdir(path) and not _os.path.basename(path).startswith(
            ("checkpoint", "epoch")
        ):
            path = find_latest_checkpoint(path) or path
        logger.info(f"loading trained UNet weights from {path}")
        model.unet_params = load_params_for_inference(path)

    if cfg.sampling.lora_checkpoint:
        import os as _os

        from stable_diffusion_pytorch_tpu.models.lora import merge_lora
        from stable_diffusion_pytorch_tpu.utils.checkpoint import (
            find_latest_checkpoint,
            load_params_for_inference,
        )

        path = cfg.sampling.lora_checkpoint
        if _os.path.isdir(path) and not _os.path.basename(path).startswith(
            ("checkpoint", "epoch")
        ):
            path = find_latest_checkpoint(path) or path
        logger.info(
            f"merging LoRA weights from {path} (scale {cfg.sampling.lora_scale:g})"
        )
        model.unet_params = merge_lora(
            model.unet_params, load_params_for_inference(path),
            cfg.sampling.lora_scale,
        )

    if cfg.sampling.controlnet_checkpoint:
        import os as _os

        from stable_diffusion_pytorch_tpu.models.controlnet import ControlNet
        from stable_diffusion_pytorch_tpu.utils.checkpoint import (
            find_latest_checkpoint,
            load_params_for_inference,
        )

        assert cfg.sampling.control_image, (
            "--controlnet-checkpoint needs --control-image"
        )
        # comma-separated lists compose multiple ControlNets (residuals sum)
        ckpts = [p for p in cfg.sampling.controlnet_checkpoint.split(",") if p]
        modules, params = [], []
        for raw in ckpts:
            path = raw
            if _os.path.isdir(path) and not _os.path.basename(path).startswith(
                ("checkpoint", "epoch")
            ):
                path = find_latest_checkpoint(path) or path
            modules.append(
                ControlNet.from_unet_config(
                    model.unet.latent_channels,
                    cfg.model.autoencoder.groups,
                    cfg.model.unet,
                    hint_downsamples=len(
                        cfg.model.autoencoder.autoencoder_channels_list
                    ) - 1,
                    compat=compat,
                    dtype=dtype,
                )
            )
            params.append(load_params_for_inference(path))
            logger.info(f"loaded ControlNet from {path}")
        model.attach_controlnet(modules, params)
        logger.info(
            f"{len(modules)} ControlNet(s) attached "
            f"(hints: {cfg.sampling.control_image}, "
            f"scales {cfg.sampling.control_scale})"
        )

    if cfg.sampling.textual_inversion:
        token = model.text_encoder.load_textual_inversion(
            cfg.sampling.textual_inversion
        )
        logger.info(
            f"loaded textual inversion from {cfg.sampling.textual_inversion}: "
            f"placeholder {token!r} is usable in --prompt"
        )

    logger.info(
        f"sampling {cfg.sampling.num_images} image(s) for prompt={cfg.sampling.prompt!r} "
        f"({cfg.sampling.sampler}, {cfg.sampling.sampling_steps} steps, "
        f"cfg={cfg.train.guidance_scale})"
    )
    sample(
        model,
        image_size=cfg.sampling.image_size,
        prompt=cfg.sampling.prompt,
        time_steps=cfg.sampling.sampling_steps,
        guidance_scale=cfg.train.guidance_scale,
        scale_factor=cfg.sampling.scale_factor,
        save_dir=cfg.sampling.output_dir,
        sampler=cfg.sampling.sampler,
        eta=cfg.sampling.eta,
        num_images=cfg.sampling.num_images,
        repeat_noise=cfg.sampling.repeat_noise,
        seed=cfg.train.seed,
        name=cfg.sampling.output_name,
        negative_prompt=cfg.sampling.negative_prompt,
        karras=cfg.sampling.karras,
        prediction_type=cfg.sampling.prediction_type,
        timestep_spacing=cfg.sampling.timestep_spacing,
        guidance_rescale=cfg.sampling.guidance_rescale,
        control_image=(
            [p for p in cfg.sampling.control_image.split(",") if p]
            if cfg.sampling.controlnet_checkpoint
            and "," in cfg.sampling.control_image
            else cfg.sampling.control_image
            if cfg.sampling.controlnet_checkpoint
            else None
        ),
        control_scale=cfg.sampling.control_scale,
        deep_cache_interval=cfg.sampling.deep_cache_interval,
        hires_scale=cfg.sampling.hires_scale,
        hires_strength=cfg.sampling.hires_strength,
        vae_tile=cfg.sampling.vae_tile,
    )
    logger.info(f"saved to {cfg.sampling.output_dir}/")


if __name__ == "__main__":
    main()
