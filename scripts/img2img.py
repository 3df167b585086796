#!/usr/bin/env python
"""img2img / inpainting CLI (capabilities beyond the reference).

Examples:
    python scripts/img2img.py --init-image photo.png --prompt "a watercolor" \
        --strength 0.7 --image-size 64
    python scripts/img2img.py --init-image photo.png --mask-image mask.png \
        --prompt "a red hat"    # inpainting: white mask = repaint
"""

import logging
import os
import sys
from dataclasses import dataclass, field
from typing import Optional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stable_diffusion_pytorch_tpu.config import BaseConfig  # noqa: E402

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger("img2img")


@dataclass
class Img2ImgConfig(BaseConfig):
    prompt: str = field(default="", metadata={"help": "text prompt."})
    negative_prompt: str = field(default="", metadata={"help": "negative prompt."})
    init_image: Optional[str] = field(
        default=None, metadata={"help": "path to the input image (required)."}
    )
    mask_image: Optional[str] = field(
        default=None,
        metadata={"help": "optional inpainting mask PNG (white = repaint)."},
    )
    strength: float = field(
        default=0.75, metadata={"help": "img2img noise strength in (0, 1]."}
    )
    image_size: int = field(default=64, metadata={"help": "working resolution."})
    sampling_steps: int = field(default=50, metadata={"help": "denoising steps."})
    sampler: str = field(
        default="ddim",
        metadata={"help": "sampling algorithm.", "choices": ["ddim", "ddpm", "dpmpp"]},
    )
    output_dir: str = field(default="output", metadata={"help": "output directory."})
    controlnet_checkpoint: Optional[str] = field(
        default=None,
        metadata={
            "help": "ControlNet checkpoint dir (train_controlnet.py); "
            "requires --control-image."
        },
    )
    control_image: Optional[str] = field(
        default=None,
        metadata={"help": "conditioning image steering through the ControlNet."},
    )
    control_scale: float = field(
        default=1.0, metadata={"help": "ControlNet residual strength."}
    )


def main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.platform import (
        enable_compilation_cache,
        ensure_platform,
    )

    ensure_platform()
    enable_compilation_cache()

    from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models, resolve_dtype
    from stable_diffusion_pytorch_tpu.pipeline import img2img, inpaint

    args, cfg = load_config(argv, extra_data_classes=[Img2ImgConfig])
    icfg = cfg.img2img
    assert icfg.init_image, "--init-image is required"

    model = build_models(
        cfg.model,
        logger=logger,
        compat=compat_from_cfg(cfg),
        dtype=resolve_dtype(cfg.parallel.mixed_precision),
        seed=cfg.train.seed,
        init_image_size=icfg.image_size,
    )
    if icfg.controlnet_checkpoint:
        from stable_diffusion_pytorch_tpu.models.controlnet import ControlNet
        from stable_diffusion_pytorch_tpu.utils.checkpoint import (
            find_latest_checkpoint,
            load_params_for_inference,
        )

        assert icfg.control_image, "--controlnet-checkpoint needs --control-image"
        path = icfg.controlnet_checkpoint
        if os.path.isdir(path) and not os.path.basename(path).startswith(
            ("checkpoint", "epoch")
        ):
            path = find_latest_checkpoint(path) or path
        controlnet = ControlNet.from_unet_config(
            model.unet.latent_channels,
            cfg.model.autoencoder.groups,
            cfg.model.unet,
            hint_downsamples=len(
                cfg.model.autoencoder.autoencoder_channels_list
            ) - 1,
            dtype=model.unet.dtype,
        )
        model.attach_controlnet(controlnet, load_params_for_inference(path))
        logger.info(f"loaded ControlNet from {path}")

    common = dict(
        prompt=icfg.prompt,
        image_size=icfg.image_size,
        time_steps=icfg.sampling_steps,
        guidance_scale=cfg.train.guidance_scale,
        sampler=icfg.sampler,
        save_dir=icfg.output_dir,
        seed=cfg.train.seed,
        negative_prompt=icfg.negative_prompt,
        control_image=icfg.control_image if icfg.controlnet_checkpoint else None,
        control_scale=icfg.control_scale,
    )
    if icfg.mask_image:
        logger.info(f"inpainting {icfg.init_image} with mask {icfg.mask_image}")
        inpaint(model, icfg.init_image, icfg.mask_image, **common)
    else:
        logger.info(f"img2img on {icfg.init_image} (strength {icfg.strength})")
        img2img(model, icfg.init_image, strength=icfg.strength, **common)
    logger.info(f"saved to {icfg.output_dir}/")


if __name__ == "__main__":
    main()
