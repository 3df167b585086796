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


def add_model_args(parser):
    """DEPRECATED legacy model argparse surface (model_utils.py:19-26):
    delegates to each component's deprecated ``add_*_args``."""
    from stable_diffusion_pytorch_tpu.models.schedule import add_ddpm_args

    model_group = parser.add_argument_group("model")
    UNetModel.add_unet_args(parser)
    add_ddpm_args(parser)
    CLIPModel.add_clip_args(parser)
    AutoEncoderKL.add_autoencoder_args(parser)
    return model_group


def resolve_dtype(mixed_precision: str) -> jnp.dtype:
    return _DTYPES.get(mixed_precision, jnp.float32)


def count_params(params, name: str = "model", logger=None) -> int:
    """Total parameter count, logged like model_utils.py:52-68."""
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if logger is not None:
        logger.info(f"{name} has {total * 1e-6:.2f} M params.")
    return total


def _try_load_pretrained_vae(pretrained_dir, model_cfg, dtype, logger):
    """Pretrained VAE resolution order (loud either way):

    1. ``{pretrained_dir}/vae/`` — a diffusers-format AutoencoderKL directory
       (the exact frozen VAE the reference swaps in, train_unet.py:68-73).
    2. ``{pretrained_dir}/vae.pt`` — a reference-format from-scratch
       AutoEncoderKL torch checkpoint (converted via utils.torch_port).
    Returns (module, params, tag) or None.
    """
    import os

    if not pretrained_dir:
        return None
    vae_dir = os.path.join(pretrained_dir, "vae")
    if os.path.isdir(vae_dir):
        from stable_diffusion_pytorch_tpu.models.diffusers_vae import (
            load_diffusers_vae,
        )

        loaded = load_diffusers_vae(vae_dir, dtype=dtype)
        if loaded is not None:
            module, params = loaded
            if module.latent_channels != model_cfg.autoencoder.latent_channels and logger:
                logger.warning(
                    f"pretrained VAE latent_channels={module.latent_channels} "
                    f"overrides --latent-channels={model_cfg.autoencoder.latent_channels}"
                )
            return module, params, f"diffusers AutoencoderKL from {vae_dir}"
    pt_path = os.path.join(pretrained_dir, "vae.pt")
    if os.path.exists(pt_path):
        from stable_diffusion_pytorch_tpu.utils.torch_port import (
            convert_reference_autoencoder,
            load_reference_checkpoint,
        )

        module = AutoEncoderKL.from_config(model_cfg.autoencoder, dtype=dtype)
        params = convert_reference_autoencoder(
            load_reference_checkpoint(pt_path), model_cfg.autoencoder
        )
        return module, params, f"reference-format AutoEncoderKL from {pt_path}"
    return None


def _try_load_pretrained_unet(pretrained_dir, unet_cfg, latent_channels, logger):
    """``{pretrained_dir}/unet.pt``: a reference-format UNet torch checkpoint
    converted to our tree (utils.torch_port). Returns params or None."""
    import os

    if not pretrained_dir:
        return None
    pt_path = os.path.join(pretrained_dir, "unet.pt")
    if not os.path.exists(pt_path):
        return None
    from stable_diffusion_pytorch_tpu.utils.torch_port import (
        convert_reference_unet,
        load_reference_checkpoint,
    )

    return convert_reference_unet(
        load_reference_checkpoint(pt_path), unet_cfg, latent_channels
    )


def build_models(
    model_cfg,
    logger=None,
    compat=None,
    dtype: jnp.dtype = jnp.float32,
    seed: int = 0,
    init_image_size: int = 64,
    remat=False,  # bool or a policy name ("full"/"conv-save"/"dots_saveable")
    pretrained_dir: Optional[str] = "__from_clip_cfg__",
) -> LatentDiffusion:
    """DDPM schedule + UNet + frozen CLIP + AutoEncoderKL -> LatentDiffusion
    (model_utils.py:29-49). Params are initialized here (spatial dims of the
    init inputs don't affect parameter shapes).

    Pretrained weights: when ``pretrained_dir`` (default: the CLIP config's
    ``model_dir``, i.e. ``data/pretrained``) holds locally staged weights they
    are loaded and logged loudly — ``vae/`` (diffusers format, the frozen VAE
    of train_unet.py:68-73), ``vae.pt`` / ``unet.pt`` (reference-format torch
    checkpoints), ``text_encoder/`` (HF CLIP, handled inside CLIPModel). Pass
    ``pretrained_dir=None`` to force random initialization.
    """
    if compat is not None and hasattr(compat, "resolved"):
        compat = compat.resolved()
    if pretrained_dir == "__from_clip_cfg__":
        pretrained_dir = model_cfg.clip.model_dir

    schedule = make_schedule(model_cfg.ddpm)

    unet = UNetModel.from_config(
        model_cfg.autoencoder.latent_channels,
        model_cfg.autoencoder.groups,
        model_cfg.unet,
        compat=compat,
        dtype=dtype,
        remat=remat,
    )
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

    unet_params = _try_load_pretrained_unet(
        pretrained_dir, model_cfg.unet, model_cfg.autoencoder.latent_channels, logger
    )
    unet_pretrained = unet_params is not None
    if unet_params is None:
        unet_params = unet.init(k_unet, dummy_latent, dummy_t, dummy_ctx)

    vae_loaded = _try_load_pretrained_vae(pretrained_dir, model_cfg, dtype, logger)
    if vae_loaded is not None:
        autoencoder, vae_params, vae_tag = vae_loaded
    else:
        autoencoder = AutoEncoderKL.from_config(
            model_cfg.autoencoder, compat=compat, dtype=dtype
        )
        dummy_img = jnp.zeros(
            (1, init_image_size, init_image_size, model_cfg.autoencoder.in_channels),
            dtype,
        )
        vae_params = autoencoder.init(k_vae, dummy_img)
        vae_tag = None

    if logger is not None:
        count_params(unet_params, "UNetModel", logger)
        count_params(text_encoder.params, "CLIPModel", logger)
        count_params(vae_params, "AutoEncoderKL", logger)
        loaded = [
            name
            for name, ok in [
                ("unet", unet_pretrained),
                ("vae", vae_tag is not None),
                ("clip", text_encoder.pretrained),
            ]
            if ok
        ]
        missing = [n for n in ("unet", "vae", "clip") if n not in loaded]
        logger.info(
            f"pretrained weights loaded: {loaded or 'NONE'}"
            + (f" ({vae_tag})" if vae_tag else "")
        )
        if missing:
            logger.warning(
                f"pretrained weights NOT found for {missing} under "
                f"{pretrained_dir!r} — these components are randomly initialized"
            )

    return LatentDiffusion(
        unet,
        unet_params,
        autoencoder,
        vae_params,
        text_encoder,
        schedule,
        compat=compat,
    )
