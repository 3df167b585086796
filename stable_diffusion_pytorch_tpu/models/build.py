"""Model assembly: build and initialize every component into a LatentDiffusion.

Counterpart of /root/reference/utils/model_utils.py:29-68. The CLIP text encoder
is frozen by construction (it lives outside the trainable param tree), matching
``text_encoder.requires_grad_(False)`` (model_utils.py:37).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from stable_diffusion_pytorch_tpu.models.autoencoder import AutoEncoderKL
from stable_diffusion_pytorch_tpu.models.clip import CLIPModel
from stable_diffusion_pytorch_tpu.models.latent_diffusion import LatentDiffusion
from stable_diffusion_pytorch_tpu.models.schedule import make_schedule
from stable_diffusion_pytorch_tpu.models.unet import UNetModel

_DTYPES = {
    "no": jnp.float32,
    "fp32": jnp.float32,
    "bf16": jnp.bfloat16,
    # fp16 maps to bf16 on TPU: same width, far safer numerics on this hardware
    "fp16": jnp.bfloat16,
}


def resolve_dtype(mixed_precision: str) -> jnp.dtype:
    return _DTYPES.get(mixed_precision, jnp.float32)


def count_params(params, name: str = "model", logger=None) -> int:
    """Total parameter count, logged like model_utils.py:52-68."""
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if logger is not None:
        logger.info(f"{name} has {total * 1e-6:.2f} M params.")
    return total


def build_models(
    model_cfg,
    logger=None,
    compat=None,
    dtype: jnp.dtype = jnp.float32,
    seed: int = 0,
    init_image_size: int = 64,
    remat: bool = False,
) -> LatentDiffusion:
    """DDPM schedule + UNet + frozen CLIP + AutoEncoderKL -> LatentDiffusion
    (model_utils.py:29-49). Params are initialized here (spatial dims of the
    init inputs don't affect parameter shapes)."""
    if compat is not None and hasattr(compat, "resolved"):
        compat = compat.resolved()

    schedule = make_schedule(model_cfg.ddpm)

    unet = UNetModel.from_config(
        model_cfg.autoencoder.latent_channels,
        model_cfg.autoencoder.groups,
        model_cfg.unet,
        compat=compat,
        dtype=dtype,
        remat=remat,
    )
    autoencoder = AutoEncoderKL.from_config(model_cfg.autoencoder, compat=compat, dtype=dtype)
    text_encoder = CLIPModel(model_cfg.clip, dtype=dtype)

    key = jax.random.PRNGKey(seed)
    k_unet, k_vae = jax.random.split(key)

    f = 2 ** (len(model_cfg.autoencoder.autoencoder_channels_list) - 1)
    latent_hw = max(init_image_size // f, 2)
    dummy_latent = jnp.zeros(
        (1, latent_hw, latent_hw, model_cfg.autoencoder.latent_channels), dtype
    )
    dummy_t = jnp.zeros((1,), jnp.int32)
    dummy_ctx = jnp.zeros((1, model_cfg.clip.max_seq_len, model_cfg.unet.context_dim), dtype)
    unet_params = unet.init(k_unet, dummy_latent, dummy_t, dummy_ctx)

    dummy_img = jnp.zeros(
        (1, init_image_size, init_image_size, model_cfg.autoencoder.in_channels), dtype
    )
    vae_params = autoencoder.init(k_vae, dummy_img)

    if logger is not None:
        count_params(unet_params, "UNetModel", logger)
        count_params(text_encoder.params, "CLIPModel", logger)
        count_params(vae_params, "AutoEncoderKL", logger)

    return LatentDiffusion(
        unet,
        unet_params,
        autoencoder,
        vae_params,
        text_encoder,
        schedule,
        compat=compat,
    )
