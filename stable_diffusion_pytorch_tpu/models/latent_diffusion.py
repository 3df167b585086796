"""LatentDiffusion: UNet + VAE + CLIP + schedule, with a jit-compiled sampler.

Counterpart of /root/reference/stable_diffusion/models/latent_diffusion.py:12-126.
TPU-first re-design of the reverse loop:

- the reference runs a Python loop calling the UNet per step and *re-encodes the
  empty-prompt embedding every iteration* (latent_diffusion.py:55-60); here both
  cond and uncond embeddings are encoded ONCE and the entire loop is a single
  ``lax.scan`` inside one XLA program — per-step coefficients are gathered from
  the schedule tables with traced indices;
- classifier-free guidance doubles the batch inside the scan ([uncond, cond] on
  axis 0, latent_diffusion.py:52-61) so the UNet runs one batched forward;
- DDIM (deterministic, evenly-spaced timesteps) is the default sampler; DDPM
  ancestral sampling and every reference quirk (ascending loop, swapped CFG
  formula, uniform init noise, leading-timestep few-step schedule) are available
  via CompatConfig for per-step numeric parity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stable_diffusion_pytorch_tpu.models import schedule as sched_lib
from stable_diffusion_pytorch_tpu.models.schedule import DiffusionSchedule


def cfg_combine(
    eps_uncond: jnp.ndarray,
    eps_cond: jnp.ndarray,
    guidance_scale: float,
    reference_formula: bool = False,
) -> jnp.ndarray:
    """Classifier-free-guidance combine.

    Standard: ``uncond + g * (cond - uncond)``. The reference swaps the chunk
    names and anchors on the wrong term (latent_diffusion.py:62-65), net effect
    ``uncond + g * (uncond - cond)`` — reproduced when ``reference_formula``.
    """
    if reference_formula:
        return eps_uncond + guidance_scale * (eps_uncond - eps_cond)
    return eps_uncond + guidance_scale * (eps_cond - eps_uncond)


def rescale_cfg(
    combined: jnp.ndarray, cond: jnp.ndarray, phi: float
) -> jnp.ndarray:
    """Guidance rescale (Lin et al. 2023 §3.4, Eq. 15-16): shrink the CFG
    output's per-sample std back to the conditional prediction's std, blended
    by ``phi`` — counteracts the over-saturation/over-exposure high guidance
    causes, which zero-terminal-SNR schedules make visible."""
    axes = tuple(range(1, combined.ndim))
    c32 = combined.astype(jnp.float32)
    std_cond = jnp.std(cond.astype(jnp.float32), axis=axes, keepdims=True)
    std_cfg = jnp.std(c32, axis=axes, keepdims=True)
    rescaled = c32 * (std_cond / jnp.maximum(std_cfg, 1e-8))
    return (phi * rescaled + (1.0 - phi) * c32).astype(combined.dtype)


def make_pred_noise_fn(
    unet_module,
    guidance_scale: float = 1.0,
    reference_cfg_formula: bool = False,
    guidance_rescale: float = 0.0,
):
    """Build the pure eps-prediction function used by trainers and the sampler.

    Returns ``f(unet_params, x_t [B,h,w,c], t [B], context [B,S,D],
    uncond [B,S,D] or None) -> eps [B,h,w,c]``. With guidance <= 1 a single
    conditional forward is used (latent_diffusion.py:49-51); otherwise the batch
    is doubled as [uncond, cond]. ``guidance_rescale > 0`` applies the CFG
    std-rescale in model-output space (eps, or v for v-prediction models).
    """
    do_cfg = guidance_scale > 1.0

    def pred_noise(unet_params, x_t, t, context_emb, uncond_emb=None):
        if not do_cfg:
            return unet_module.apply(unet_params, x_t, t, context_emb)
        assert uncond_emb is not None, "CFG requires the uncond embedding"
        x_in = jnp.concatenate([x_t, x_t], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        c_in = jnp.concatenate([uncond_emb, context_emb], axis=0)
        eps = unet_module.apply(unet_params, x_in, t_in, c_in)
        eps_uncond, eps_cond = jnp.split(eps, 2, axis=0)
        out = cfg_combine(
            eps_uncond, eps_cond, guidance_scale, reference_cfg_formula
        )
        if guidance_rescale > 0.0:
            out = rescale_cfg(out, eps_cond, guidance_rescale)
        return out

    return pred_noise


class _ControlShim:
    """Duck-typed ``unet_module`` for the samplers: ``apply(packed, x, t, c)``
    where ``packed = (unet_params, (cn_params...), (hints...))``. Hints stay
    traced inputs — no recompile per image — and are tiled when CFG doubles
    the batch. MULTIPLE ControlNets compose by summing their scaled residuals
    (the standard multi-ControlNet scheme)."""

    def __init__(self, unet_module, controlnet_modules, control_scales):
        self.unet = unet_module
        self.controlnets = list(controlnet_modules)
        self.scales = [float(s) for s in control_scales]
        assert len(self.controlnets) == len(self.scales)
        self.dtype = unet_module.dtype

    def apply(self, packed, x, t, context_emb):
        unet_params, cn_params_list, hints = packed
        total_skips = None
        total_mid = None
        for mod, p, scale, hint in zip(
            self.controlnets, cn_params_list, self.scales, hints
        ):
            if hint.shape[0] != x.shape[0]:  # CFG doubled the batch
                reps = x.shape[0] // hint.shape[0]
                hint = jnp.concatenate([hint] * reps, axis=0)
            skips, mid = mod.apply(p, x, t, context_emb, hint)
            s = jnp.asarray(scale, mid.dtype)
            if total_skips is None:
                total_skips = [r * s for r in skips]
                total_mid = mid * s
            else:
                total_skips = [a + r * s for a, r in zip(total_skips, skips)]
                total_mid = total_mid + mid * s
        return self.unet.apply(
            unet_params, x, t, context_emb,
            control=(tuple(total_skips), total_mid),
        )


SIGMA_SPACE_SAMPLERS = ("euler", "euler_a", "heun", "dpmpp_sde")
SAMPLERS = ("ddim", "ddpm", "dpmpp") + SIGMA_SPACE_SAMPLERS


def make_sample_fn(
    unet_module,
    schedule: DiffusionSchedule,
    num_steps: int,
    sampler: str = "ddim",
    guidance_scale: float = 7.5,
    eta: float = 0.0,
    repeat_noise: bool = False,
    scale_factor: float = 1.0,
    reference_cfg_formula: bool = False,
    ascending_loop: bool = False,
    leading_timesteps: bool = False,
    strength: float = 1.0,
    inpaint: bool = False,
    karras: bool = False,
    prediction_type: str = "epsilon",
    timestep_spacing: str = "even",
    guidance_rescale: float = 0.0,
    deep_cache_interval: int = 0,
):
    """Build the jittable reverse-diffusion loop as a single ``lax.scan``.

    ``deep_cache_interval=N > 1`` enables DeepCache (Ma et al. 2023): the
    UNet's deep trunk is recomputed every N steps and reused in between (only
    the level-0 shallow blocks run on cached steps) — an OPT-IN speed/quality
    trade. Discrete samplers only; requires a plain UNetModel (no ControlNet
    shim).

    Returns ``f(unet_params, x_T, context_emb, uncond_emb, key) -> x_0``
    (with ``inpaint=True``: ``f(..., key, mask, init_latents)`` where mask is
    [B,h,w,1] with 1 = region to generate, 0 = keep; the kept region is
    re-noised to each step's level and blended in, the standard latent
    inpainting scheme).

    ``strength < 1`` (img2img) runs only the final ``round(num_steps*strength)``
    steps of the subsequence — the caller must q-sample its init latents to the
    FIRST timestep of the truncated schedule (exposed as ``.start_timestep``).

    Samplers: discrete-timestep ``ddim``/``ddpm``/``dpmpp`` step the trained
    grid directly; sigma-space ``euler``/``euler_a``/``heun``/``dpmpp_sde``
    integrate the probability-flow ODE/SDE in the k-diffusion convention (see
    schedule.py), optionally on ``karras`` spacing, conditioning the UNet on
    fractional timesteps via log-sigma interpolation. ``eta`` for the
    stochastic sigma-space samplers defaults to 1 when left at 0.

    Timesteps: DDIM/DDPM default to the evenly-spaced descending subsequence;
    ``leading_timesteps`` reproduces the reference's few-step quirk (raw steps
    S-1..0, latent_diffusion.py:103-107) and ``ascending_loop`` its reversed
    iteration order (0..T-1 over the chosen subsequence).
    """
    if sampler not in SAMPLERS:
        raise ValueError(f"unknown sampler {sampler!r}")
    if prediction_type not in ("epsilon", "v_prediction"):
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    if timestep_spacing not in ("even", "trailing"):
        raise ValueError(f"unknown timestep_spacing {timestep_spacing!r}")
    # a zero-terminal-SNR schedule (alpha_bar[T-1] == 0) has sigma = inf at the
    # terminal step: unusable in sigma space, and eps-prediction cannot recover
    # x0 there (divide by sqrt(alpha_bar) = 0)
    terminal_zero = bool(schedule.alphas_cumprod[-1] <= 0.0)
    if terminal_zero and sampler in SIGMA_SPACE_SAMPLERS:
        raise ValueError(
            "zero-terminal-SNR schedules have sigma=inf at the terminal step; "
            "use a discrete sampler (ddim/ddpm/dpmpp)"
        )
    if terminal_zero and timestep_spacing == "trailing" and prediction_type == "epsilon":
        raise ValueError(
            "trailing spacing on a zero-terminal-SNR schedule starts at "
            "SNR 0, where eps-prediction is undefined; train and sample with "
            "--prediction-type v_prediction"
        )
    if deep_cache_interval > 1:
        if sampler in SIGMA_SPACE_SAMPLERS:
            raise ValueError(
                "deep_cache_interval supports the discrete samplers "
                "(ddim/ddpm/dpmpp) only"
            )
        if not hasattr(unet_module, "channels_list"):
            raise ValueError(
                "deep_cache_interval needs a plain UNetModel (incompatible "
                "with the ControlNet shim)"
            )
        if len(unet_module.channels_list) < 2:
            raise ValueError("deep_cache_interval needs a >=2-level UNet")
    if sampler in SIGMA_SPACE_SAMPLERS:
        return _make_sigma_sample_fn(
            unet_module,
            schedule,
            num_steps,
            sampler=sampler,
            guidance_scale=guidance_scale,
            eta=eta,
            reference_cfg_formula=reference_cfg_formula,
            strength=strength,
            inpaint=inpaint,
            karras=karras,
            prediction_type=prediction_type,
            timestep_spacing=timestep_spacing,
            guidance_rescale=guidance_rescale,
        )

    if leading_timesteps or num_steps == schedule.noise_steps:
        ts = sched_lib.leading_timesteps(min(num_steps, schedule.noise_steps))
    elif timestep_spacing == "trailing":
        ts = sched_lib.trailing_timesteps(schedule.noise_steps, num_steps)
    else:
        ts = sched_lib.spaced_timesteps(schedule.noise_steps, num_steps)

    if strength < 1.0:
        keep = max(min(round(num_steps * strength), num_steps), 1)
        ts = ts[num_steps - keep :]
        num_steps = keep
    # prev step for DDIM/DPM++: next entry in the descending sequence, -1 at end
    ts_prev = jnp.concatenate([ts[1:], jnp.full((1,), -1, ts.dtype)])
    # step BEFORE each entry for DPM++ multistep; >= noise_steps marks "first"
    ts_last = jnp.concatenate(
        [jnp.full((1,), schedule.noise_steps, ts.dtype), ts[:-1]]
    )
    if ascending_loop:
        # reference quirk: iterate the schedule in ascending-t order
        ts, ts_prev, ts_last = ts[::-1], ts_prev[::-1], ts_last[::-1]

    pred_noise = make_pred_noise_fn(
        unet_module, guidance_scale, reference_cfg_formula, guidance_rescale
    )

    use_dc = deep_cache_interval > 1
    do_cfg = guidance_scale > 1.0

    def pred_noise_dc(unet_params, x_t, t, ctx, uncond, deep, refresh):
        """DeepCache-aware eps prediction: (eps, trunk). On refresh steps the
        full UNet runs and re-emits the deep trunk; otherwise only the shallow
        level-0 blocks run against the carried trunk. The CFG-doubled batch is
        cached as a whole."""
        if do_cfg:
            x_in = jnp.concatenate([x_t, x_t], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            c_in = jnp.concatenate([uncond, ctx], axis=0)
        else:
            x_in, t_in, c_in = x_t, t, ctx
        out, new_deep = jax.lax.cond(
            refresh,
            lambda d: unet_module.apply(
                unet_params, x_in, t_in, c_in, return_deep=True
            ),
            lambda d: (
                unet_module.apply(unet_params, x_in, t_in, c_in, deep_cache=d),
                d,
            ),
            deep,
        )
        if do_cfg:
            eps_u, eps_c = jnp.split(out, 2, axis=0)
            eps = cfg_combine(eps_u, eps_c, guidance_scale, reference_cfg_formula)
            if guidance_rescale > 0.0:
                eps = rescale_cfg(eps, eps_c, guidance_rescale)
        else:
            eps = out
        return eps, new_deep

    def sample(unet_params, x_T, context_emb, uncond_emb, key,
               mask=None, init_latents=None):
        bsz = x_T.shape[0]

        def body(carry, step):
            if use_dc:
                x, x0_prev, k, deep = carry
                t, t_prev, t_last, idx = step
            else:
                x, x0_prev, k = carry
                t, t_prev, t_last = step
            k, sub, k_blend = jax.random.split(k, 3)
            t_batch = jnp.full((bsz,), t, jnp.int32)
            if use_dc:
                eps, deep = pred_noise_dc(
                    unet_params, x, t_batch, context_emb, uncond_emb, deep,
                    (idx % deep_cache_interval) == 0,
                )
            else:
                eps = pred_noise(unet_params, x, t_batch, context_emb, uncond_emb)
            x0_v = None
            if prediction_type == "v_prediction":
                alpha, sigma_vp = sched_lib.alpha_sigma_at(schedule, t)
                v = eps
                eps = sched_lib.eps_from_v(x, v, alpha, sigma_vp)
                # direct data prediction: finite even at alpha_bar = 0 (the
                # trailing step of a zero-terminal-SNR schedule), where the
                # eps-derived x0 in the step functions would be 0 * inf
                x0_v = sched_lib.x0_from_v(x, v, alpha, sigma_vp)
            if sampler == "ddim":
                x_next, x0 = sched_lib.ddim_step(
                    schedule, eps, x, t, t_prev, key=sub, eta=eta, x0=x0_v
                )
            elif sampler == "dpmpp":
                x_next, x0 = sched_lib.dpmpp_2m_step(
                    schedule, eps, x, t, t_prev, x0_prev, t_last, x0=x0_v
                )
            else:
                x_next, x0 = sched_lib.ddpm_step(
                    schedule,
                    eps,
                    x,
                    t,
                    sub,
                    repeat_noise=repeat_noise,
                    scale_factor=scale_factor,
                    x0=x0_v,
                )
            if inpaint:
                # re-noise the KNOWN region to the step we just landed on and
                # blend; at t_prev < 0 the known region is the clean init
                noise = jax.random.normal(k_blend, x_next.shape, x_next.dtype)
                t_prev_b = jnp.full((bsz,), jnp.maximum(t_prev, 0), jnp.int32)
                known = sched_lib.add_noise(schedule, init_latents, noise, t_prev_b)
                known = jnp.where(t_prev >= 0, known, init_latents)
                x_next = mask * x_next + (1.0 - mask) * known
            if use_dc:
                return (x_next, x0, k, deep), None
            return (x_next, x0, k), None

        if use_dc:
            ch1 = unet_module.channels_list[1]
            b_in = bsz * (2 if do_cfg else 1)
            deep0 = jnp.zeros(
                (b_in,) + tuple(x_T.shape[1:3]) + (ch1,), unet_module.dtype
            )
            init = (x_T, jnp.zeros_like(x_T), key, deep0)
            xs = (ts, ts_prev, ts_last, jnp.arange(len(ts)))
            (x_0, _, _, _), _ = jax.lax.scan(body, init, xs)
            return x_0

        init = (x_T, jnp.zeros_like(x_T), key)
        (x_0, _, _), _ = jax.lax.scan(body, init, (ts, ts_prev, ts_last))
        return x_0

    sample.start_timestep = int(ts[0])
    return sample


def _make_sigma_sample_fn(
    unet_module,
    schedule: DiffusionSchedule,
    num_steps: int,
    sampler: str,
    guidance_scale: float,
    eta: float,
    reference_cfg_formula: bool,
    strength: float,
    inpaint: bool,
    karras: bool,
    prediction_type: str = "epsilon",
    timestep_spacing: str = "even",
    guidance_rescale: float = 0.0,
):
    """Sigma-space (k-diffusion convention) reverse loop as one ``lax.scan``.

    The input keeps the same convention as the discrete samplers: ``x_T`` is
    the VP-space latent at the first timestep of the (possibly truncated)
    schedule — internally converted to sigma space via
    ``x = x_vp * sqrt(1 + sigma_0^2)`` (exact, since 1/sqrt(abar) =
    sqrt(1+sigma^2)), so img2img init latents q-sampled to ``start_timestep``
    plug in unchanged.
    """
    if timestep_spacing == "trailing":
        ts = sched_lib.trailing_timesteps(schedule.noise_steps, num_steps)
    else:
        ts = sched_lib.spaced_timesteps(schedule.noise_steps, num_steps)
    if strength < 1.0:
        keep = max(min(round(num_steps * strength), num_steps), 1)
        ts = ts[num_steps - keep :]
        num_steps = keep

    tab = sched_lib.vp_sigmas(schedule)
    if karras:
        sigmas = sched_lib.karras_sigmas(tab[ts[-1]], tab[ts[0]], num_steps)
    else:
        sigmas = tab[ts].astype(jnp.float32)
    sigmas_all = jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])
    sig_cur, sig_next = sigmas_all[:-1], sigmas_all[1:]

    # stochastic sigma-space samplers default to eta=1 when unset
    eff_eta = eta if eta > 0.0 else 1.0

    pred_noise = make_pred_noise_fn(
        unet_module, guidance_scale, reference_cfg_formula, guidance_rescale
    )

    def sample(unet_params, x_T, context_emb, uncond_emb, key,
               mask=None, init_latents=None):
        bsz = x_T.shape[0]
        dtype = x_T.dtype

        def eval_eps(x_k, sigma):
            """One denoiser call: sigma-space x -> eps (VP-space model)."""
            c_in = (1.0 / jnp.sqrt(1.0 + sigma**2)).astype(dtype)
            t = sched_lib.t_from_sigma(schedule, sigma)
            t_batch = jnp.full((bsz,), t, jnp.float32)
            x_vp = x_k * c_in
            out = pred_noise(unet_params, x_vp, t_batch, context_emb, uncond_emb)
            if prediction_type == "v_prediction":
                # at sigma: alpha = 1/sqrt(1+sigma^2), sigma_vp = sigma*alpha
                alpha = 1.0 / jnp.sqrt(1.0 + sigma**2)
                out = sched_lib.eps_from_v(x_vp, out, alpha, sigma * alpha)
            return out

        def body(carry, step):
            x, d_prev, h_last, k = carry
            sigma, sigma_next = step
            k, k_noise, k_blend = jax.random.split(k, 3)
            eps = eval_eps(x, sigma)
            denoised = x - sigma.astype(dtype) * eps

            if sampler == "euler":
                x_next = sched_lib.euler_step(x, eps, sigma, sigma_next)
                h = h_last
            elif sampler == "euler_a":
                s_down, s_up = sched_lib.ancestral_sigmas(sigma, sigma_next, eff_eta)
                x_next = sched_lib.euler_step(x, eps, sigma, s_down)
                noise = jax.random.normal(k_noise, x.shape, dtype)
                x_next = x_next + s_up.astype(dtype) * noise
                h = h_last
            elif sampler == "heun":
                x_e = sched_lib.euler_step(x, eps, sigma, sigma_next)
                # 2nd-order correction; skipped (first-order) on the final step
                def second_order(xe):
                    eps2 = eval_eps(xe, jnp.maximum(sigma_next, 1e-8))
                    return sched_lib.euler_step(x, 0.5 * (eps + eps2), sigma, sigma_next)
                x_next = jax.lax.cond(sigma_next > 0.0, second_order, lambda xe: xe, x_e)
                h = h_last
            else:  # dpmpp_sde
                noise = jax.random.normal(k_noise, x.shape, dtype)
                x_next, h = sched_lib.dpmpp_2m_sde_step(
                    x, denoised, d_prev, sigma, sigma_next, h_last, noise, eff_eta
                )

            if inpaint:
                # known region in sigma space at sigma_next: x0 + sigma_next*n
                noise_b = jax.random.normal(k_blend, x_next.shape, dtype)
                known = init_latents + sigma_next.astype(dtype) * noise_b
                x_next = mask * x_next + (1.0 - mask) * known
            return (x_next, denoised, h, k), None

        sigma0 = sigmas_all[0]
        x = x_T * jnp.sqrt(1.0 + sigma0**2).astype(dtype)
        init = (x, jnp.zeros_like(x), jnp.asarray(0.0, jnp.float32), key)
        (x_0, _, _, _), _ = jax.lax.scan(body, init, (sig_cur, sig_next))
        # terminal sigma is 0, so x_0 is already in VP space (abar = 1)
        return x_0

    sample.start_timestep = int(ts[0])
    return sample


class LatentDiffusion:
    """Facade bundling modules + params with the reference's method surface
    (latent_diffusion.py:12-126). Heavy lifting is done by the pure functions
    above; this class manages params, jit caching and numpy boundaries."""

    def __init__(
        self,
        unet_module,
        unet_params,
        autoencoder_module,
        autoencoder_params,
        text_encoder,
        schedule: DiffusionSchedule,
        compat=None,
    ):
        self.unet = unet_module
        self.unet_params = unet_params
        self.autoencoder = autoencoder_module
        self.autoencoder_params = autoencoder_params
        self.text_encoder = text_encoder
        self.noise_scheduler = schedule
        self.compat = compat
        self.controlnet = None  # set via attach_controlnet
        self.controlnet_params = None
        self._jit_cache: dict = {}

    def attach_controlnet(self, controlnet_module, controlnet_params) -> None:
        """Register one or several ControlNets (models/controlnet.py); pass
        lists for multi-ControlNet composition (residuals sum). Subsequent
        ``sample`` calls may pass ``control_hint`` (one hint per net) to steer
        generation."""
        if not isinstance(controlnet_module, (list, tuple)):
            controlnet_module = [controlnet_module]
            controlnet_params = [controlnet_params]
        assert len(controlnet_module) == len(controlnet_params)
        self.controlnet = list(controlnet_module)
        self.controlnet_params = list(controlnet_params)
        self._jit_cache.clear()

    # ------------------------------------------------------------------ #
    # embedding helpers
    # ------------------------------------------------------------------ #

    def encode_prompts(self, prompts, weighted: Optional[bool] = None) -> jnp.ndarray:
        """``weighted=None`` auto-detects ``(word:1.3)`` emphasis syntax
        (models/prompt_weighting.py); disabled in reference-compat mode, where
        brackets stay literal like the reference tokenizer treats them.

        Prompts longer than the 77-token window are encoded in K chunks and
        concatenated ([B, K*77, 768] — the A1111/lpw long-prompt scheme; the
        flash kernel masks the arbitrary kv length), also gated off in
        reference-compat mode (the reference truncates)."""
        prompts = list(prompts)
        compat_mode = self.compat is not None and self.compat.reference_compat
        if weighted is None:
            from stable_diffusion_pytorch_tpu.models.prompt_weighting import (
                has_weight_syntax,
            )

            weighted = not compat_mode and any(has_weight_syntax(p) for p in prompts)
        te = self.text_encoder
        if not compat_mode:
            ids, w, k = te.tokenize_chunked(prompts, weighted=weighted)
            if k > 1:
                return te.encode_text_chunked(ids, w)
        if weighted:
            out, w = te.tokenize_weighted(prompts)
            return te.encode_text(out.input_ids, token_weights=w)
        return te.encode_text(te.tokenize(prompts).input_ids)

    def encode_uncond(self, batch_size: int, text: str = "") -> jnp.ndarray:
        """Unconditional (or negative-prompt) embedding, broadcast to batch."""
        emb = self.encode_prompts([text])
        return jnp.broadcast_to(emb, (batch_size,) + emb.shape[1:])

    @staticmethod
    def align_uncond(uncond: jnp.ndarray, context_emb: jnp.ndarray) -> jnp.ndarray:
        """Long-prompt chunking can make cond and uncond/negative sequence
        lengths differ (K*77 vs K'*77); tile-and-truncate the uncond to match
        so the CFG concat stays rectangular."""
        if uncond.shape[1] == context_emb.shape[1]:
            return uncond
        s = context_emb.shape[1]
        reps = -(-s // uncond.shape[1])  # ceil
        return jnp.tile(uncond, (1, reps, 1))[:, :s, :]

    # ------------------------------------------------------------------ #
    # reference-parity methods
    # ------------------------------------------------------------------ #

    def pred_noise(
        self,
        noised_sample: jnp.ndarray,
        time_step: jnp.ndarray,
        context_emb: jnp.ndarray,
        guidance_scale: float = 1.0,
    ) -> jnp.ndarray:
        """Eager eps prediction (latent_diffusion.py:27-65)."""
        fn = make_pred_noise_fn(
            self.unet,
            guidance_scale,
            bool(self.compat and self.compat.cfg_formula),
        )
        uncond = (
            self.encode_uncond(noised_sample.shape[0])
            if guidance_scale > 1.0
            else None
        )
        return fn(self.unet_params, noised_sample, time_step, context_emb, uncond)

    def sample(
        self,
        noised_sample: jnp.ndarray,
        context_emb: jnp.ndarray,
        guidance_scale: float = 7.5,
        repeat_noise: bool = False,
        scale_factor: float = 1.0,
        time_steps: Optional[int] = None,
        sampler: str = "ddpm",
        eta: float = 0.0,
        key: Optional[jax.Array] = None,
        negative_prompt: str = "",
        karras: bool = False,
        prediction_type: str = "epsilon",
        timestep_spacing: str = "even",
        guidance_rescale: float = 0.0,
        control_hint: Optional[jnp.ndarray] = None,
        control_scale: float = 1.0,
        deep_cache_interval: int = 0,
    ) -> jnp.ndarray:
        """Reverse loop x_T -> x_0 (latent_diffusion.py:67-126), jit-compiled.

        The reference's default sampler is DDPM over the full schedule; pass
        ``sampler="ddim"`` for the fast deterministic path, or any of
        ``SAMPLERS`` (sigma-space euler/euler_a/heun/dpmpp_sde supported,
        optionally on ``karras`` spacing).

        ``control_hint`` [B, H, W, C] (pixel-space conditioning image, [-1,1])
        routes every denoiser call through the attached ControlNet
        (``attach_controlnet``); the hint rides the sampler as a traced input
        packed alongside the params, so one compiled program serves any hint.
        Multi-ControlNet: pass a LIST of hints (one per attached net) and
        optionally a list of ``control_scale`` values — the residuals sum.
        """
        num_steps = time_steps or self.noise_scheduler.noise_steps
        compat = self.compat
        use_control = control_hint is not None
        if use_control:
            assert self.controlnet is not None, (
                "call attach_controlnet(...) before sampling with control_hint"
            )
            hints = (
                list(control_hint)
                if isinstance(control_hint, (list, tuple))
                else [control_hint]
            )
            assert len(hints) == len(self.controlnet), (
                f"{len(hints)} hint(s) for {len(self.controlnet)} attached "
                "ControlNet(s)"
            )
            scales = (
                [float(s) for s in control_scale]
                if isinstance(control_scale, (list, tuple))
                else [float(control_scale)] * len(hints)
            )
        cache_key = (
            num_steps,
            sampler,
            float(guidance_scale),
            float(eta),
            bool(repeat_noise),
            float(scale_factor),
            bool(karras),
            prediction_type,
            timestep_spacing,
            float(guidance_rescale),
            noised_sample.shape,
            context_emb.shape,
            (tuple(jnp.shape(h) for h in hints), tuple(scales))
            if use_control
            else None,
            int(deep_cache_interval),
        )
        if cache_key not in self._jit_cache:
            fn = make_sample_fn(
                _ControlShim(self.unet, self.controlnet, scales)
                if use_control
                else self.unet,
                self.noise_scheduler,
                num_steps,
                sampler=sampler,
                guidance_scale=guidance_scale,
                eta=eta,
                repeat_noise=repeat_noise,
                scale_factor=scale_factor,
                karras=karras,
                prediction_type=prediction_type,
                timestep_spacing=timestep_spacing,
                guidance_rescale=guidance_rescale,
                reference_cfg_formula=bool(compat and compat.cfg_formula),
                ascending_loop=bool(compat and compat.ascending_sample_loop),
                # the reference's few-step quirk only applies when t_steps given
                leading_timesteps=bool(
                    compat and compat.ascending_sample_loop and time_steps
                ),
                deep_cache_interval=deep_cache_interval,
            )
            self._jit_cache[cache_key] = jax.jit(fn)
        sample_fn = self._jit_cache[cache_key]

        uncond = (
            self.encode_uncond(noised_sample.shape[0], negative_prompt)
            if guidance_scale > 1.0
            else jnp.zeros_like(context_emb)
        )
        uncond = self.align_uncond(uncond, context_emb)
        if key is None:
            key = jax.random.PRNGKey(0)
        if use_control:
            packed = (
                self.unet_params,
                tuple(self.controlnet_params),
                tuple(jnp.asarray(h, noised_sample.dtype) for h in hints),
            )
            return sample_fn(packed, noised_sample, context_emb, uncond, key)
        return sample_fn(self.unet_params, noised_sample, context_emb, uncond, key)

    # ------------------------------------------------------------------ #
    # VAE passthroughs
    # ------------------------------------------------------------------ #

    def encode_image(self, img: jnp.ndarray):
        """-> AutoEncoderKLOutput (posterior)."""
        return self.autoencoder.apply(
            self.autoencoder_params, img, method=self.autoencoder.encode
        )

    def decode_latent(
        self,
        latent: jnp.ndarray,
        tile: Optional[int] = None,
        tile_overlap: int = 8,
    ) -> jnp.ndarray:
        """VAE decode; ``tile`` (latent-space tile side) enables tiled decoding
        for large images: overlapping latent tiles decode independently and
        blend with linear ramps (diffusers enable_vae_tiling semantics — the
        per-tile GroupNorm statistics make this a close approximation, not
        bit-exact). Keeps peak decoder activations bounded by the tile size
        instead of the full image."""
        h, w = latent.shape[1:3]
        if tile is None or (h <= tile and w <= tile):
            return self.autoencoder.apply(
                self.autoencoder_params, latent, method=self.autoencoder.decode
            )
        assert tile > 2 * tile_overlap, "tile must exceed twice the overlap"
        f = 2 ** (len(self.autoencoder.channels_list) - 1)
        stride = tile - tile_overlap

        def ramp(n_pix: int, lo_open: bool, hi_open: bool) -> jnp.ndarray:
            """Per-pixel blend weight: linear ramps on open (interior) edges."""
            wgt = jnp.ones((n_pix,), jnp.float32)
            r = tile_overlap * f
            edge = (jnp.arange(r) + 1.0) / (r + 1.0)
            if lo_open:
                wgt = wgt.at[:r].set(edge)
            if hi_open:
                wgt = wgt.at[-r:].set(edge[::-1])
            return wgt

        b = latent.shape[0]
        out = None
        acc = None
        row_starts = list(range(0, max(h - tile_overlap, 1), stride))
        col_starts = list(range(0, max(w - tile_overlap, 1), stride))
        for r0 in row_starts:
            r1 = min(r0 + tile, h)
            r0 = max(r1 - tile, 0)  # full-size tile even at the edge
            for c0 in col_starts:
                c1 = min(c0 + tile, w)
                c0 = max(c1 - tile, 0)
                dec = self.autoencoder.apply(
                    self.autoencoder_params,
                    latent[:, r0:r1, c0:c1, :],
                    method=self.autoencoder.decode,
                ).astype(jnp.float32)
                if out is None:
                    out = jnp.zeros(
                        (b, h * f, w * f, dec.shape[-1]), jnp.float32
                    )
                    acc = jnp.zeros((b, h * f, w * f, 1), jnp.float32)
                wgt = (
                    ramp((r1 - r0) * f, r0 > 0, r1 < h)[:, None]
                    * ramp((c1 - c0) * f, c0 > 0, c1 < w)[None, :]
                )[None, :, :, None]
                out = out.at[:, r0 * f : r1 * f, c0 * f : c1 * f, :].add(dec * wgt)
                acc = acc.at[:, r0 * f : r1 * f, c0 * f : c1 * f, :].add(wgt)
        return (out / jnp.maximum(acc, 1e-8)).astype(latent.dtype)

    def latent_shape(self, batch: int, image_size: int) -> Tuple[int, int, int, int]:
        f = 2 ** (len(self.autoencoder.channels_list) - 1)
        return (batch, image_size // f, image_size // f, self.autoencoder.latent_channels)
