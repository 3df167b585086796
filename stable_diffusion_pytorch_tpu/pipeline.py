"""Text-to-image sampling pipeline.

Counterpart of /root/reference/scripts/txt2img.py:14-48, re-designed TPU-first:

- the latent shape is computed directly from the VAE config instead of encoding
  a throwaway random image through the VAE (txt2img.py:29-32);
- cond and uncond prompt embeddings are encoded ONCE before the loop (the
  reference re-encodes "" inside every step, latent_diffusion.py:55-60);
- the whole reverse loop runs as one jitted ``lax.scan`` (see
  models/latent_diffusion.py) followed by an in-graph VAE decode;
- initial noise defaults to N(0,1); the reference's U[0,1) quirk
  (txt2img.py:33) is available via CompatConfig.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_pytorch_tpu.config import BaseConfig
from stable_diffusion_pytorch_tpu.models.latent_diffusion import LatentDiffusion
from stable_diffusion_pytorch_tpu.utils.data import detransform, to_img


@dataclass
class SamplingConfig(BaseConfig):
    """CLI group for the txt2img entry point."""

    prompt: str = field(default="a cat", metadata={"help": "text prompt to sample."})
    negative_prompt: str = field(
        default="",
        metadata={"help": "negative prompt used as the CFG unconditional branch."},
    )
    image_size: int = field(default=64, metadata={"help": "output image resolution."})
    sampling_steps: int = field(default=50, metadata={"help": "number of denoising steps."})
    sampler: str = field(
        default="ddim",
        metadata={
            "help": "sampling algorithm (dpmpp = DPM-Solver++ 2M, ~20 steps for "
            "DDIM-50 quality; euler/euler_a/heun/dpmpp_sde are sigma-space "
            "k-diffusion-style samplers).",
            "choices": ["ddim", "ddpm", "dpmpp", "euler", "euler_a", "heun", "dpmpp_sde"],
        },
    )
    karras: bool = field(
        default=False,
        metadata={"help": "use Karras sigma spacing for the sigma-space samplers."},
    )
    prediction_type: str = field(
        default="epsilon",
        metadata={
            "help": "what the UNet predicts: epsilon or v_prediction "
            "(SD-2.x-style; must match how the checkpoint was trained).",
            "choices": ["epsilon", "v_prediction"],
        },
    )
    timestep_spacing: str = field(
        default="even",
        metadata={
            "help": "few-step subsequence spacing: even (ends at t=0 side) or "
            "trailing (starts at t=T-1; required for zero-terminal-SNR "
            "checkpoints, Lin et al. 2023).",
            "choices": ["even", "trailing"],
        },
    )
    guidance_rescale: float = field(
        default=0.0,
        metadata={
            "help": "CFG std-rescale factor phi (Lin et al. 2023 §3.4); 0 "
            "disables, 0.7 is the paper's recommendation for zero-SNR "
            "checkpoints at high guidance."
        },
    )
    eta: float = field(
        default=0.0,
        metadata={
            "help": "DDIM eta (0 = deterministic); noise scale for euler_a/"
            "dpmpp_sde (0 means their default of 1)."
        },
    )
    num_images: int = field(default=1, metadata={"help": "batch of images to sample."})
    scale_factor: float = field(default=1.0, metadata={"help": "noise temperature for DDPM."})
    repeat_noise: bool = field(
        default=False, metadata={"help": "share posterior noise across the batch."}
    )
    output_dir: str = field(default="output", metadata={"help": "directory for saved PNGs."})
    output_name: str = field(default="txt2img", metadata={"help": "basename for saved PNGs."})
    unet_checkpoint: Optional[str] = field(
        default=None,
        metadata={
            "help": "Trainer checkpoint (checkpoint-N dir, or a ckpt dir with "
            "'latest' resolution) to load UNet weights from; EMA preferred."
        },
    )
    lora_checkpoint: Optional[str] = field(
        default=None,
        metadata={
            "help": "LoRA trainer checkpoint (from --lora-rank training) to "
            "merge into the UNet weights before sampling."
        },
    )
    lora_scale: float = field(
        default=1.0,
        metadata={
            "help": "merge scale for --lora-checkpoint; equals alpha/rank "
            "used in training (training default alpha=rank -> 1.0)."
        },
    )
    textual_inversion: Optional[str] = field(
        default=None,
        metadata={
            "help": "textual-inversion checkpoint dir (from "
            "train_textual_inversion.py); registers the learned placeholder "
            "token so it can be used in --prompt."
        },
    )
    controlnet_checkpoint: Optional[str] = field(
        default=None,
        metadata={
            "help": "ControlNet checkpoint dir (from train_controlnet.py); "
            "requires --control-image."
        },
    )
    control_image: Optional[str] = field(
        default=None,
        metadata={
            "help": "conditioning image (e.g. edge map) steering sampling "
            "through the loaded ControlNet; comma-separated list for "
            "multi-ControlNet (matching --controlnet-checkpoint order)."
        },
    )
    control_scale: float = field(
        default=1.0,
        metadata={"help": "strength of the ControlNet residuals (0 = off)."},
    )
    deep_cache_interval: int = field(
        default=0,
        metadata={
            "help": "DeepCache: refresh the UNet's deep trunk every N steps "
            "and reuse it in between (N > 1 enables; speed/quality trade; "
            "ddim/ddpm/dpmpp only)."
        },
    )
    hires_scale: float = field(
        default=0.0,
        metadata={
            "help": "hires fix: sample at --image-size, latent-upscale by "
            "this factor (e.g. 2), then img2img-refine at high resolution "
            "(> 1 enables)."
        },
    )
    hires_strength: float = field(
        default=0.6,
        metadata={
            "help": "fraction of the schedule re-run at high resolution in "
            "the hires fix."
        },
    )
    vae_tile: int = field(
        default=0,
        metadata={
            "help": "tiled VAE decode: latent-space tile side (e.g. 64) for "
            "large images; 0 = decode whole (bounds decoder activations, "
            "pairs with --hires-scale)."
        },
    )


def _load_image(image, resolution: int) -> np.ndarray:
    """Accept a path / HWC uint8 array / [-1,1] float array -> [1,H,W,3] float."""
    from stable_diffusion_pytorch_tpu.utils.data import transform_image

    if isinstance(image, str):
        from PIL import Image

        image = np.asarray(Image.open(image).convert("RGB"))
    image = np.asarray(image)
    if image.dtype == np.uint8:
        image = transform_image(image, resolution)
    return image[None].astype(np.float32)


def _control_module_and_params(model, control_image, control_scale, image_size, dtype):
    """(module, params-for-the-sampler) pair: the plain UNet, or — when
    control image(s) are given — the ControlNet shim with the hints packed
    alongside the params (models/latent_diffusion.py:_ControlShim). Lists
    compose multiple ControlNets (residuals sum)."""
    if control_image is None:
        return model.unet, model.unet_params
    from stable_diffusion_pytorch_tpu.models.latent_diffusion import _ControlShim

    assert model.controlnet is not None, (
        "pass control_image only after model.attach_controlnet(...)"
    )
    images = (
        list(control_image)
        if isinstance(control_image, (list, tuple))
        else [control_image]
    )
    assert len(images) == len(model.controlnet), (
        f"{len(images)} control image(s) for {len(model.controlnet)} nets"
    )
    scales = (
        [float(s) for s in control_scale]
        if isinstance(control_scale, (list, tuple))
        else [float(control_scale)] * len(images)
    )
    hints = tuple(
        jnp.asarray(_load_image(img, image_size), dtype) for img in images
    )
    shim = _ControlShim(model.unet, model.controlnet, scales)
    packed = (model.unet_params, tuple(model.controlnet_params), hints)
    return shim, packed


def _hires_refine(
    model, x0, ctx, *, guidance_scale, sampler, time_steps, hires_scale,
    hires_strength, key, negative_prompt, eta, prediction_type,
    timestep_spacing, guidance_rescale,
):
    """Stage 2 of the hires fix: latent-space bilinear upscale + partial
    re-noise + denoise of the final ``hires_strength`` schedule fraction."""
    import jax.image

    from stable_diffusion_pytorch_tpu.models import schedule as sched_lib
    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn

    dtype = model.unet.dtype
    b, h, w, c = x0.shape
    h2, w2 = int(round(h * hires_scale)), int(round(w * hires_scale))
    x_up = jax.image.resize(
        x0.astype(jnp.float32), (b, h2, w2, c), method="bilinear"
    ).astype(dtype)

    fn = make_sample_fn(
        model.unet,
        model.noise_scheduler,
        time_steps,
        sampler=sampler,
        guidance_scale=guidance_scale,
        eta=eta,
        strength=hires_strength,
        prediction_type=prediction_type,
        timestep_spacing=timestep_spacing,
        guidance_rescale=guidance_rescale,
    )
    k_noise, k_loop = jax.random.split(key)
    t0 = jnp.full((b,), fn.start_timestep, jnp.int32)
    noise = jax.random.normal(k_noise, x_up.shape, dtype)
    x_t = sched_lib.add_noise(model.noise_scheduler, x_up, noise, t0)
    uncond = (
        model.align_uncond(
            model.encode_uncond(b, negative_prompt).astype(dtype), ctx
        )
        if guidance_scale > 1.0
        else jnp.zeros_like(ctx)
    )
    return jax.jit(fn)(model.unet_params, x_t, ctx, uncond, k_loop)


def img2img(
    model: LatentDiffusion,
    init_image,
    prompt: str = "",
    strength: float = 0.75,
    image_size: int = 64,
    time_steps: int = 50,
    guidance_scale: float = 7.5,
    sampler: str = "ddim",
    eta: float = 0.0,
    save_dir: Optional[str] = "output",
    seed: int = 42,
    name: str = "img2img",
    negative_prompt: str = "",
    control_image=None,
    control_scale: float = 1.0,
) -> np.ndarray:
    """Image-to-image: noise the init image's latent to ``strength`` of the
    schedule, then denoise the remaining steps (capability beyond the
    reference). Returns the HWC uint8 result. ``control_image`` steers through
    the attached ControlNet (``model.attach_controlnet``)."""
    import jax

    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn

    key = jax.random.PRNGKey(seed)
    k_enc, k_noise, k_loop = jax.random.split(key, 3)
    dtype = model.unet.dtype

    img = jnp.asarray(_load_image(init_image, image_size), dtype)
    posterior = model.encode_image(img)
    init_latents = posterior.latent_dist.sample(k_enc)

    module, params = _control_module_and_params(
        model, control_image, control_scale, image_size, dtype
    )
    fn = make_sample_fn(
        module,
        model.noise_scheduler,
        time_steps,
        sampler=sampler,
        guidance_scale=guidance_scale,
        eta=eta,
        strength=strength,
    )
    from stable_diffusion_pytorch_tpu.models import schedule as sched_lib

    t0 = jnp.full((1,), fn.start_timestep, jnp.int32)
    noise = jax.random.normal(k_noise, init_latents.shape, dtype)
    x_t = sched_lib.add_noise(model.noise_scheduler, init_latents, noise, t0)

    ctx = model.encode_prompts([prompt]).astype(dtype)
    uncond = (
        model.align_uncond(
            model.encode_uncond(1, negative_prompt).astype(dtype), ctx
        )
        if guidance_scale > 1.0
        else jnp.zeros_like(ctx)
    )
    x_0 = jax.jit(fn)(params, x_t, ctx, uncond, k_loop)
    out = np.asarray(model.decode_latent(x_0).astype(jnp.float32))
    digit = detransform(out[0])
    if save_dir is not None:
        to_img(digit, output_path=save_dir, name=name)
    return digit


def inpaint(
    model: LatentDiffusion,
    init_image,
    mask_image,
    prompt: str = "",
    image_size: int = 64,
    time_steps: int = 50,
    guidance_scale: float = 7.5,
    sampler: str = "ddim",
    save_dir: Optional[str] = "output",
    seed: int = 42,
    name: str = "inpaint",
    negative_prompt: str = "",
    control_image=None,
    control_scale: float = 1.0,
) -> np.ndarray:
    """Latent inpainting: generate inside the mask (white = repaint), re-noise
    and keep the rest each step (capability beyond the reference).
    ``control_image`` steers through the attached ControlNet."""
    import jax

    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn

    key = jax.random.PRNGKey(seed)
    k_enc, k_init, k_loop = jax.random.split(key, 3)
    dtype = model.unet.dtype

    img = jnp.asarray(_load_image(init_image, image_size), dtype)
    init_latents = model.encode_image(img).latent_dist.sample(k_enc)

    # mask: path / array, any size -> latent-res [1,h,w,1] in {0,1}
    if isinstance(mask_image, str):
        from PIL import Image

        mask_image = np.asarray(Image.open(mask_image).convert("L"))
    mask = np.asarray(mask_image, np.float32)
    if mask.max() > 1.0:
        mask = mask / 255.0
    h, w = init_latents.shape[1:3]
    import jax.image

    mask = jax.image.resize(jnp.asarray(mask), (h, w), method="nearest")
    mask = (mask > 0.5).astype(dtype)[None, :, :, None]

    module, params = _control_module_and_params(
        model, control_image, control_scale, image_size, dtype
    )
    fn = make_sample_fn(
        module,
        model.noise_scheduler,
        time_steps,
        sampler=sampler,
        guidance_scale=guidance_scale,
        inpaint=True,
    )
    noise = jax.random.normal(k_init, init_latents.shape, dtype)
    ctx = model.encode_prompts([prompt]).astype(dtype)
    uncond = (
        model.align_uncond(
            model.encode_uncond(1, negative_prompt).astype(dtype), ctx
        )
        if guidance_scale > 1.0
        else jnp.zeros_like(ctx)
    )
    x_0 = jax.jit(fn)(
        params, noise, ctx, uncond, k_loop, mask, init_latents
    )
    out = np.asarray(model.decode_latent(x_0).astype(jnp.float32))
    digit = detransform(out[0])
    if save_dir is not None:
        to_img(digit, output_path=save_dir, name=name)
    return digit


def sample(
    model: LatentDiffusion,
    image_size: int = 64,
    prompt="",
    time_steps: int = 50,
    guidance_scale: float = 7.5,
    scale_factor: float = 1.0,
    save_dir: Optional[str] = "output",
    sampler: str = "ddim",
    eta: float = 0.0,
    num_images: int = 1,
    repeat_noise: bool = False,
    seed=42,
    name: str = "txt2img",
    negative_prompt: str = "",
    karras: bool = False,
    prediction_type: str = "epsilon",
    timestep_spacing: str = "even",
    guidance_rescale: float = 0.0,
    control_image=None,
    control_scale: float = 1.0,
    deep_cache_interval: int = 0,
    hires_scale: float = 0.0,
    hires_strength: float = 0.6,
    vae_tile: int = 0,
) -> List[np.ndarray]:
    """Sample image(s); returns HWC uint8 arrays and saves PNGs.

    ``deep_cache_interval=N > 1`` enables DeepCache block caching (opt-in
    speed/quality trade: the UNet's deep trunk refreshes every N steps).

    ``hires_scale > 1`` enables the two-stage hires fix (the A1111 scheme):
    sample at ``image_size``, bilinear-upscale the LATENT by the factor, then
    img2img-refine the final ``hires_strength`` fraction of the schedule at
    high resolution — large images without the incoherence of sampling them
    from scratch.

    ``control_image`` (path / HWC uint8 / [-1,1] float array) steers sampling
    through the attached ControlNet (``model.attach_controlnet``), scaled by
    ``control_scale``.

    Call surface mirrors the reference ``sample`` (scripts/txt2img.py:14-48).
    Batched serving extension: ``prompt`` may be a LIST of prompts (then
    ``num_images = len(prompt)``) and ``seed`` a list of per-request seeds —
    each batch row draws its init noise from its own seed, so a request's
    image is identical whether it was served solo or co-batched.
    """
    if isinstance(prompt, (list, tuple)):
        prompts = list(prompt)
        num_images = len(prompts)
    else:
        prompts = [prompt] * num_images

    shape = model.latent_shape(num_images, image_size)
    uniform_init = model.compat is not None and model.compat.uniform_init_noise
    if isinstance(seed, (list, tuple)):
        # batched serving: each row draws from ITS OWN seed, so a request's
        # image is identical whether served solo or co-batched
        assert len(seed) == num_images, "one seed per image"
        row_shape = (1,) + tuple(shape[1:])
        rows, loop_keys = [], []
        for s in seed:
            k_init, k_loop = jax.random.split(jax.random.PRNGKey(int(s)))
            rows.append(
                jax.random.uniform(k_init, row_shape)  # quirk (txt2img.py:33)
                if uniform_init
                else jax.random.normal(k_init, row_shape)
            )
            loop_keys.append(k_loop)
        noise = jnp.concatenate(rows, axis=0)
        k_loop = loop_keys[0]
    else:
        key = jax.random.PRNGKey(seed)
        k_init, k_loop = jax.random.split(key)
        noise = (
            jax.random.uniform(k_init, shape)  # reference quirk (txt2img.py:33)
            if uniform_init
            else jax.random.normal(k_init, shape)
        )
    dtype = model.unet.dtype
    noise = noise.astype(dtype)

    context_emb = model.encode_prompts(prompts).astype(dtype)

    control_hint = None
    if control_image is not None:
        control_hint = (
            [jnp.asarray(_load_image(i, image_size)) for i in control_image]
            if isinstance(control_image, (list, tuple))
            else jnp.asarray(_load_image(control_image, image_size))
        )

    x_0 = model.sample(
        noised_sample=noise,
        context_emb=context_emb,
        guidance_scale=guidance_scale,
        scale_factor=scale_factor,
        time_steps=time_steps,
        sampler=sampler,
        eta=eta,
        repeat_noise=repeat_noise,
        key=k_loop,
        negative_prompt=negative_prompt,
        karras=karras,
        prediction_type=prediction_type,
        timestep_spacing=timestep_spacing,
        guidance_rescale=guidance_rescale,
        control_hint=control_hint,
        control_scale=control_scale,
        deep_cache_interval=deep_cache_interval,
    )
    if hires_scale > 1.0:
        x_0 = _hires_refine(
            model, x_0, context_emb,
            guidance_scale=guidance_scale,
            sampler=sampler if sampler in ("ddim", "ddpm", "dpmpp") else "ddim",
            time_steps=time_steps,
            hires_scale=hires_scale,
            hires_strength=hires_strength,
            key=jax.random.fold_in(k_loop, 1),
            negative_prompt=negative_prompt,
            eta=eta,
            prediction_type=prediction_type,
            timestep_spacing=timestep_spacing,
            guidance_rescale=guidance_rescale,
        )
    images = model.decode_latent(x_0, tile=vae_tile or None)
    images = np.asarray(images.astype(jnp.float32))

    outputs = []
    for i in range(num_images):
        digit = detransform(images[i])
        outputs.append(digit)
        if save_dir is not None:
            suffix = f"_{i}" if num_images > 1 else ""
            to_img(digit, output_path=save_dir, name=f"{name}{suffix}")
    return outputs
