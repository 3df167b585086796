"""Model-size presets.

``reference``: the tiny defaults the reference trains at 64x64 (unet.py:30-57,
autoencoder.py:22-48). ``sd15``: a Stable-Diffusion-1.5-scale stack (860M-param
UNet, f8 VAE, 512x512) — the scale BASELINE.json's north-star throughput target
("≥2x A100 images/sec/chip at 512x512 50-step DDIM") is defined against.

Under the reference's attn_mult rule (models/utils.py:55-96) the SD-1.5
``attention_resolutions=[1,2,4]`` places attention at latent resolutions
64/32/16 and none at the deepest 8x8 level, matching real SD-1.5.
"""

from stable_diffusion_pytorch_tpu.models.autoencoder import AutoencoderConfig
from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig
from stable_diffusion_pytorch_tpu.models.unet import UnetConfig


def reference_unet_config() -> UnetConfig:
    return UnetConfig()


def sd15_unet_config() -> UnetConfig:
    return UnetConfig(
        num_res_blocks=2,
        n_heads=8,
        attention_resolutions=[1, 2, 4],
        channels_list=[320, 640, 1280, 1280],
        time_emb_dim=1280,
        dropout=0.0,
        n_layers=1,
        context_dim=768,
    )


def sd15_autoencoder_config() -> AutoencoderConfig:
    # 4 levels -> downsample factor f8: 512x512 image -> 64x64x4 latent
    return AutoencoderConfig(
        in_channels=3,
        latent_channels=4,
        out_channels=3,
        autoencoder_channels_list=[128, 256, 512, 512],
        autoencoder_num_res_blocks=2,
        groups=32,
        kl_weight=1.0,
    )


def sd15_ddpm_config() -> DDPMConfig:
    return DDPMConfig(noise_schedule="linear", noise_steps=1000)
