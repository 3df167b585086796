"""DDPM/DDIM noise schedules as pure JAX functions over precomputed tables.

TPU-native counterpart of the reference ``DDPMScheduler``
(/root/reference/stable_diffusion/models/scheduler.py:25-219). The reference is a
stateful torch class whose ``step`` takes a Python-int timestep and draws from the
global torch RNG; here the schedule is an immutable pytree of coefficient tables and
every step function is jittable with a *traced* timestep and an explicit PRNG key, so
the whole reverse loop compiles into a single ``lax.scan``.

Capabilities beyond the reference:
- ``cosine`` and ``cubic`` beta schedules are actually implemented (the reference
  declares the choices at scheduler.py:11-17 but only implements ``linear``).
- a true deterministic DDIM sampler (``ddim_step``); the reference's ``step`` is the
  stochastic DDPM posterior only (scheduler.py:141-219) despite the repo's metric
  naming DDIM.
- evenly-spaced timestep subsequences for few-step sampling; the reference's
  ``time_steps=50`` quirk (using raw steps 49..0 of the 1000-step schedule,
  latent_diffusion.py:103-107) is available via ``leading_timesteps``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from dataclasses import dataclass, field
from flax import struct

from stable_diffusion_pytorch_tpu.config import BaseConfig


@dataclass
class DDPMConfig(BaseConfig):
    """Flag surface mirrors /root/reference/stable_diffusion/models/scheduler.py:9-22."""

    noise_schedule: str = field(
        default="linear",
        metadata={
            "help": "Noise schedule type.",
            "choices": ["linear", "cosine", "cubic"],
        },
    )
    noise_steps: int = field(default=1000, metadata={"help": "Number of noise steps."})
    beta_start: float = field(default=1e-4, metadata={"help": "Starting value of beta."})
    beta_end: float = field(default=0.02, metadata={"help": "Ending value of beta."})
    zero_terminal_snr: bool = field(
        default=False,
        metadata={
            "help": "rescale betas so alpha_bar(T) = 0 (Lin et al. 2023, "
            "'Common Diffusion Noise Schedules and Sample Steps are Flawed'). "
            "Requires --prediction-type v_prediction (eps is undefined at "
            "SNR 0); sample with --timestep-spacing trailing."
        },
    )


@struct.dataclass
class DiffusionSchedule:
    """Immutable coefficient tables, all shape [T] float32.

    Table definitions match scheduler.py:59-87 so DDPM stepping is numerically
    parity-checkable against the reference.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alpha_bar: jnp.ndarray
    sqrt_1m_alpha_bar: jnp.ndarray
    sqrt_recip_alpha_bar: jnp.ndarray
    sqrt_recip_m1_alpha_bar: jnp.ndarray
    log_var: jnp.ndarray          # clamped log posterior variance
    mean_x0_coef: jnp.ndarray
    mean_xt_coef: jnp.ndarray
    noise_steps: int = struct.field(pytree_node=False)

    @property
    def noise_time_steps(self) -> jnp.ndarray:
        """Descending [T-1 .. 0], like scheduler.py:56-58."""
        return jnp.arange(self.noise_steps - 1, -1, -1)


def add_ddpm_args(parser):
    """DEPRECATED legacy argparse group (scheduler.py:26-50). The schedule here
    is a pure-function module rather than a class, so the legacy surface is a
    module function; prefer ``config.load_config``."""
    from stable_diffusion_pytorch_tpu.config import add_legacy_args

    return add_legacy_args(parser, DDPMConfig, "ddpm")


def make_betas(
    schedule: str, noise_steps: int, beta_start: float, beta_end: float
) -> jnp.ndarray:
    if schedule == "linear":
        # scheduler.py:89-93
        return jnp.linspace(beta_start, beta_end, noise_steps, dtype=jnp.float32)
    if schedule == "cosine":
        # Nichol & Dhariwal (2021): alpha_bar(t) = cos^2(((t/T)+s)/(1+s) * pi/2)
        s = 0.008
        t = jnp.arange(noise_steps + 1, dtype=jnp.float32) / noise_steps
        alpha_bar = jnp.cos((t + s) / (1 + s) * math.pi / 2) ** 2
        betas = 1.0 - alpha_bar[1:] / alpha_bar[:-1]
        return jnp.clip(betas, 0.0, 0.999)
    if schedule == "cubic":
        # cubic interpolation between beta_start^(1/3) and beta_end^(1/3)
        # (the "scaled" family; the quadratic variant is SD's "scaled_linear")
        return (
            jnp.linspace(
                beta_start ** (1.0 / 3.0),
                beta_end ** (1.0 / 3.0),
                noise_steps,
                dtype=jnp.float32,
            )
            ** 3
        )
    raise ValueError(f"unknown noise schedule: {schedule!r}")


def rescale_zero_terminal_snr(betas: jnp.ndarray) -> jnp.ndarray:
    """Rescale betas so the terminal alpha_bar is exactly 0 (Lin et al. 2023,
    Algorithm 1): shift-and-scale sqrt(alpha_bar) linearly so the first entry
    is preserved and the last hits 0, then recover betas.

    With alpha_bar(T) = 0 the forward process actually reaches pure noise, so
    training and sampling see the same terminal distribution (the standard
    linear schedule leaves SNR(T) ~ 4.6e-3 — the model never learns t=T from
    pure noise, yet sampling starts there). Only meaningful with the
    v-prediction objective: eps-prediction is undefined at SNR 0.
    """
    sqrt_ab = jnp.sqrt(jnp.cumprod(1.0 - betas))
    s0, sT = sqrt_ab[0], sqrt_ab[-1]
    sqrt_ab = (sqrt_ab - sT) * s0 / (s0 - sT)
    ab = sqrt_ab**2
    alphas = jnp.concatenate([ab[:1], ab[1:] / ab[:-1]])
    return 1.0 - alphas


def make_schedule(cfg: DDPMConfig) -> DiffusionSchedule:
    """Precompute all alpha_bar-derived tables (scheduler.py:59-87)."""
    betas = make_betas(cfg.noise_schedule, cfg.noise_steps, cfg.beta_start, cfg.beta_end)
    if getattr(cfg, "zero_terminal_snr", False):
        betas = rescale_zero_terminal_snr(betas)
    alphas = 1.0 - betas
    alphas_cumprod = jnp.cumprod(alphas)
    alpha_bar_prev = jnp.concatenate([jnp.ones((1,), betas.dtype), alphas_cumprod[:-1]])
    variance = betas * (1.0 - alpha_bar_prev) / (1.0 - alphas_cumprod)
    return DiffusionSchedule(
        betas=betas,
        alphas_cumprod=alphas_cumprod,
        sqrt_alpha_bar=jnp.sqrt(alphas_cumprod),
        sqrt_1m_alpha_bar=jnp.sqrt(1.0 - alphas_cumprod),
        sqrt_recip_alpha_bar=alphas_cumprod**-0.5,
        sqrt_recip_m1_alpha_bar=jnp.sqrt(1.0 / alphas_cumprod - 1.0),
        log_var=jnp.log(jnp.clip(variance, min=1e-20)),
        mean_x0_coef=betas * jnp.sqrt(alpha_bar_prev) / (1.0 - alphas_cumprod),
        mean_xt_coef=(1.0 - alpha_bar_prev) * jnp.sqrt(alphas) / (1.0 - alphas_cumprod),
        noise_steps=cfg.noise_steps,
    )


def _bcast(coef: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-batch (or scalar) coefficient over trailing dims."""
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


def add_noise(
    sched: DiffusionSchedule,
    original_samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """Forward process q(x_t | x_0) = N(sqrt(abar_t) x0, (1-abar_t) I).

    Matches scheduler.py:95-139; ``timesteps`` is [batch] int32.
    """
    sqrt_ab = _bcast(sched.sqrt_alpha_bar[timesteps], original_samples)
    sqrt_1m = _bcast(sched.sqrt_1m_alpha_bar[timesteps], original_samples)
    dtype = original_samples.dtype
    return sqrt_ab.astype(dtype) * original_samples + sqrt_1m.astype(dtype) * noise


def pred_x0_from_eps(
    sched: DiffusionSchedule, x_t: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """DDPM Eq (15): x0 = x_t/sqrt(abar_t) - sqrt(1/abar_t - 1) * eps
    (scheduler.py:181-184)."""
    a = sched.sqrt_recip_alpha_bar[t].astype(x_t.dtype)
    b = sched.sqrt_recip_m1_alpha_bar[t].astype(x_t.dtype)
    return a * x_t - b * eps


def ddpm_step(
    sched: DiffusionSchedule,
    pred_noise: jnp.ndarray,
    x_t: jnp.ndarray,
    time_step: jnp.ndarray,
    key: jax.Array,
    repeat_noise: bool = False,
    scale_factor: float = 1.0,
    x0: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One stochastic ancestral step x_t -> x_{t-1} (scheduler.py:141-219).

    ``time_step`` is a traced int32 scalar; noise is zeroed at t==0 via ``where``
    instead of the reference's Python branch so the whole loop stays inside jit.
    ``x0`` overrides the eps-derived data prediction (used by the v-prediction
    path, where x0 = alpha*x_t - sigma*v stays finite even at alpha_bar = 0).
    Returns (x_prev, pred_x0).
    """
    t = time_step
    if x0 is None:
        x0 = pred_x0_from_eps(sched, x_t, pred_noise, t)
    mean = (
        sched.mean_x0_coef[t].astype(x_t.dtype) * x0
        + sched.mean_xt_coef[t].astype(x_t.dtype) * x_t
    )
    std = jnp.exp(0.5 * sched.log_var[t]).astype(x_t.dtype)
    if repeat_noise:
        noise = jax.random.normal(key, (1,) + x_t.shape[1:], x_t.dtype)
        noise = jnp.broadcast_to(noise, x_t.shape)
    else:
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    noise = noise * jnp.asarray(scale_factor, x_t.dtype)
    # no noise on the final (t == 0) step
    noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
    return mean + std * noise, x0


def ddim_step(
    sched: DiffusionSchedule,
    pred_noise: jnp.ndarray,
    x_t: jnp.ndarray,
    time_step: jnp.ndarray,
    prev_time_step: jnp.ndarray,
    key: Optional[jax.Array] = None,
    eta: float = 0.0,
    x0: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM step x_t -> x_{t_prev} (Song et al. 2021, Eq. 12).

    ``prev_time_step < 0`` denotes abar_prev = 1 (the final step to x_0).
    With ``eta=0`` the update is deterministic; ``eta=1`` recovers DDPM-like noise.
    ``x0`` overrides the eps-derived data prediction (v-prediction path; finite
    at alpha_bar = 0 where pred_x0_from_eps is not).
    Returns (x_prev, pred_x0). The reference has no DDIM sampler; this is the
    capability its metric naming promises (SURVEY.md §2.4 item 1).
    """
    t = time_step
    t_prev = prev_time_step
    abar_t = sched.alphas_cumprod[t]
    abar_prev = jnp.where(t_prev >= 0, sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)

    if x0 is None:
        x0 = pred_x0_from_eps(sched, x_t, pred_noise, t)

    if eta > 0.0:
        if key is None:
            raise ValueError("eta > 0 requires a PRNG key")
        sigma = (
            eta
            * jnp.sqrt((1 - abar_prev) / (1 - abar_t))
            * jnp.sqrt(1 - abar_t / abar_prev)
        )
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        noise = jnp.where(t_prev >= 0, noise, jnp.zeros_like(noise))
    else:
        sigma = jnp.asarray(0.0, jnp.float32)
        noise = jnp.zeros_like(x_t)

    dir_xt = jnp.sqrt(jnp.clip(1.0 - abar_prev - sigma**2, min=0.0)).astype(
        x_t.dtype
    ) * pred_noise
    x_prev = (
        jnp.sqrt(abar_prev).astype(x_t.dtype) * x0
        + dir_xt
        + sigma.astype(x_t.dtype) * noise
    )
    return x_prev, x0


def _lambda_of(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Half-log-SNR lambda(t) = log(alpha_t / sigma_t) with t < 0 denoting the
    clean endpoint (alpha=1, sigma=0), represented by a large finite lambda."""
    abar = jnp.where(t >= 0, sched.alphas_cumprod[jnp.maximum(t, 0)], 1.0 - 1e-8)
    alpha = jnp.sqrt(abar)
    sigma = jnp.sqrt(1.0 - abar)
    return jnp.log(alpha / jnp.maximum(sigma, 1e-8))


def dpmpp_2m_step(
    sched: DiffusionSchedule,
    pred_noise: jnp.ndarray,
    x_t: jnp.ndarray,
    time_step: jnp.ndarray,
    prev_time_step: jnp.ndarray,
    x0_prev: jnp.ndarray,
    last_time_step: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DPM-Solver++(2M) step (Lu et al. 2022, data-prediction multistep).

    A second-order deterministic solver: ~20-25 steps reach DDIM-50 quality.
    The reference has nothing beyond the DDPM posterior; this is a capability
    extension. Arguments:
    - ``time_step``/``prev_time_step``: current t_i and target t_{i+1}
      (descending; -1 denotes the clean endpoint),
    - ``x0_prev``: the data prediction from the PREVIOUS solver step,
    - ``last_time_step``: t_{i-1} (the step before ``time_step``; pass a value
      >= noise_steps to mark the first step, which falls back to first order).
    Returns (x_next, x0_cur) — feed ``x0_cur`` back as the next ``x0_prev``.
    """
    t = time_step
    t_next = prev_time_step
    t_last = last_time_step

    x0_cur = x0 if x0 is not None else pred_x0_from_eps(sched, x_t, pred_noise, t)

    lam_cur = _lambda_of(sched, t)
    lam_next = _lambda_of(sched, t_next)
    lam_last = _lambda_of(sched, jnp.minimum(t_last, sched.noise_steps - 1))

    h = lam_next - lam_cur
    h_last = lam_cur - lam_last

    first = t_last >= sched.noise_steps
    r = jnp.where(first, 1.0, h_last / jnp.where(h == 0, 1.0, h))
    # 2M data combination; first step degenerates to first order (D = x0_cur)
    coef = jnp.where(first, 0.0, 1.0 / (2.0 * jnp.maximum(jnp.abs(r), 1e-8)) * jnp.sign(r))
    D = (1.0 + coef) * x0_cur.astype(jnp.float32) - coef * x0_prev.astype(jnp.float32)

    abar_next = jnp.where(t_next >= 0, sched.alphas_cumprod[jnp.maximum(t_next, 0)], 1.0)
    abar_cur = sched.alphas_cumprod[t]
    alpha_next = jnp.sqrt(abar_next)
    sigma_next = jnp.sqrt(jnp.maximum(1.0 - abar_next, 0.0))
    sigma_cur = jnp.sqrt(jnp.maximum(1.0 - abar_cur, 1e-16))

    x_next = (
        (sigma_next / sigma_cur).astype(x_t.dtype) * x_t
        + (alpha_next * -jnp.expm1(-h)).astype(x_t.dtype) * D.astype(x_t.dtype)
    )
    return x_next, x0_cur


# --------------------------------------------------------------------------- #
# v-prediction (Salimans & Ho 2022, "progressive distillation") conversions.
# With alpha = sqrt(abar), sigma = sqrt(1-abar) and x_t = alpha*x0 + sigma*eps:
#   v   = alpha*eps - sigma*x0
#   eps = alpha*v + sigma*x_t          (identity: alpha^2 + sigma^2 = 1)
#   x0  = alpha*x_t - sigma*v
# The reference trains eps-prediction only; v-prediction is the SD-2.x-style
# objective added as a capability extension (--prediction-type v_prediction).
# --------------------------------------------------------------------------- #


def alpha_sigma_at(sched: DiffusionSchedule, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(alpha, sigma_vp) = (sqrt(abar_t), sqrt(1-abar_t)) at discrete t."""
    ab = sched.alphas_cumprod[t]
    return jnp.sqrt(ab), jnp.sqrt(1.0 - ab)


def v_from_eps_x0(x0: jnp.ndarray, eps: jnp.ndarray, alpha, sigma_vp) -> jnp.ndarray:
    """Training target v = alpha*eps - sigma*x0."""
    return alpha * eps - sigma_vp * x0


def eps_from_v(x_t: jnp.ndarray, v: jnp.ndarray, alpha, sigma_vp) -> jnp.ndarray:
    """Recover the eps prediction from a v-prediction model output."""
    return (alpha * v.astype(jnp.float32) + sigma_vp * x_t.astype(jnp.float32)).astype(
        x_t.dtype
    )


def x0_from_v(x_t: jnp.ndarray, v: jnp.ndarray, alpha, sigma_vp) -> jnp.ndarray:
    """Data prediction from a v-prediction output: x0 = alpha*x_t - sigma*v.

    Finite for every SNR including alpha_bar = 0 (unlike pred_x0_from_eps,
    which divides by sqrt(alpha_bar)) — the reason zero-terminal-SNR schedules
    require the v objective."""
    return (alpha * x_t.astype(jnp.float32) - sigma_vp * v.astype(jnp.float32)).astype(
        x_t.dtype
    )


def snr_at(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio SNR(t) = abar / (1 - abar)."""
    ab = sched.alphas_cumprod[t]
    return ab / jnp.maximum(1.0 - ab, 1e-12)


def min_snr_weight(
    sched: DiffusionSchedule,
    t: jnp.ndarray,
    gamma: float,
    prediction_type: str = "epsilon",
) -> jnp.ndarray:
    """Min-SNR-gamma per-example loss weight (Hang et al. 2023).

    eps-prediction: w = min(SNR, gamma) / SNR; v-prediction: w = min(SNR,
    gamma) / (SNR + 1). Balances the per-timestep gradient scale so early
    (high-SNR) steps stop dominating training.
    """
    snr = snr_at(sched, t)
    clipped = jnp.minimum(snr, gamma)
    if prediction_type == "v_prediction":
        return clipped / (snr + 1.0)
    return clipped / jnp.maximum(snr, 1e-12)


# --------------------------------------------------------------------------- #
# sigma-space (k-diffusion family) samplers
#
# The VP schedule above maps to the EDM/k-diffusion convention via
#   sigma(t)   = sqrt((1 - abar_t) / abar_t)        (monotone increasing in t)
#   x_sigma    = x_vp / sqrt(abar_t) = x0 + sigma * n
# so an eps-prediction UNet is wrapped as a denoiser
#   D(x_sigma, sigma) = x_sigma - sigma * eps(x_sigma / sqrt(1 + sigma^2), t(sigma))
# and the probability-flow ODE is dx/dsigma = (x - D) / sigma = eps.
# These samplers are a capability extension over the reference (which has only
# the stochastic DDPM posterior, scheduler.py:141-219); the math follows the
# published EDM (Karras et al. 2022) / DPM-Solver++ (Lu et al. 2022) papers.
# --------------------------------------------------------------------------- #


def vp_sigmas(sched: DiffusionSchedule) -> jnp.ndarray:
    """[T] table sigma_t = sqrt((1-abar_t)/abar_t), ascending in t."""
    ab = sched.alphas_cumprod
    return jnp.sqrt((1.0 - ab) / ab)


def t_from_sigma(sched: DiffusionSchedule, sigma: jnp.ndarray) -> jnp.ndarray:
    """Fractional timestep for a sigma, by interpolating log-sigma over the
    discrete table (the trained model's conditioning is the timestep, so
    off-grid sigmas map to fractional t; the sinusoidal embedding is
    continuous in t)."""
    log_tab = jnp.log(vp_sigmas(sched))
    return jnp.interp(jnp.log(sigma), log_tab, jnp.arange(sched.noise_steps, dtype=jnp.float32))


def karras_sigmas(
    sigma_min: jnp.ndarray, sigma_max: jnp.ndarray, num_steps: int, rho: float = 7.0
) -> jnp.ndarray:
    """Karras et al. (2022) Eq. 5 spacing: [num_steps] descending sigmas from
    sigma_max to sigma_min (the terminal 0 is appended by the sampler)."""
    ramp = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)
    inv_rho = 1.0 / rho
    return (sigma_max**inv_rho + ramp * (sigma_min**inv_rho - sigma_max**inv_rho)) ** rho


def table_sigmas(sched: DiffusionSchedule, timesteps: jnp.ndarray) -> jnp.ndarray:
    """Sigmas at the given (descending) discrete timesteps."""
    return vp_sigmas(sched)[timesteps]


def euler_step(
    x: jnp.ndarray, eps: jnp.ndarray, sigma: jnp.ndarray, sigma_next: jnp.ndarray
) -> jnp.ndarray:
    """Explicit Euler step of the probability-flow ODE in sigma space."""
    return x + (sigma_next - sigma).astype(x.dtype) * eps


def ancestral_sigmas(
    sigma: jnp.ndarray, sigma_next: jnp.ndarray, eta: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma_down, sigma_up) split for ancestral sampling: step the ODE to
    sigma_down, then add fresh noise at sigma_up so the marginal lands on
    sigma_next (sigma_down^2 + sigma_up^2 = sigma_next^2)."""
    sig2, nxt2 = sigma**2, sigma_next**2
    sigma_up = jnp.minimum(
        sigma_next, eta * jnp.sqrt(jnp.maximum(nxt2 * (sig2 - nxt2) / jnp.maximum(sig2, 1e-20), 0.0))
    )
    sigma_down = jnp.sqrt(jnp.maximum(nxt2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


def dpmpp_2m_sde_step(
    x: jnp.ndarray,
    denoised: jnp.ndarray,
    denoised_prev: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
    h_last: jnp.ndarray,
    noise: jnp.ndarray,
    eta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DPM-Solver++(2M) SDE step (midpoint variant) in sigma space.

    ``h_last <= 0`` marks the first step (falls back to first order).
    ``sigma_next == 0`` returns the data prediction directly.
    Returns (x_next, h) — carry ``h`` back as the next ``h_last``.
    """
    t_cur, t_next = -jnp.log(jnp.maximum(sigma, 1e-20)), -jnp.log(
        jnp.maximum(sigma_next, 1e-20)
    )
    h = t_next - t_cur
    eta_h = eta * h
    decay = jnp.exp(-eta_h)
    blend = -jnp.expm1(-h - eta_h)  # 1 - exp(-(1+eta) h)

    xf = x.astype(jnp.float32)
    df = denoised.astype(jnp.float32)
    x_next = (sigma_next / jnp.maximum(sigma, 1e-20)) * decay * xf + blend * df

    first = h_last <= 0.0
    r = h_last / jnp.where(h == 0, 1.0, h)
    mid = 0.5 * blend / jnp.maximum(r, 1e-8) * (df - denoised_prev.astype(jnp.float32))
    x_next = jnp.where(first, x_next, x_next + mid)

    noise_scale = sigma_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2.0 * eta_h), 0.0))
    x_next = x_next + noise_scale * noise.astype(jnp.float32)
    # terminal step: land exactly on the data prediction
    x_next = jnp.where(sigma_next > 0.0, x_next, df)
    return x_next.astype(x.dtype), h


def spaced_timesteps(noise_steps: int, num_inference_steps: int) -> jnp.ndarray:
    """Evenly spaced descending timestep subsequence for few-step sampling.

    e.g. T=1000, S=50 -> [980, 960, ..., 20, 0]. This is the correct few-step
    schedule the reference lacks.
    """
    stride = noise_steps // num_inference_steps
    ts = (jnp.arange(num_inference_steps) * stride)[::-1]
    return ts.astype(jnp.int32)


def leading_timesteps(num_inference_steps: int) -> jnp.ndarray:
    """The reference's quirky few-step schedule: raw steps S-1..0 of the full
    schedule (latent_diffusion.py:103-107). Kept for numeric parity runs."""
    return jnp.arange(num_inference_steps - 1, -1, -1, dtype=jnp.int32)


def trailing_timesteps(noise_steps: int, num_inference_steps: int) -> jnp.ndarray:
    """Trailing-spaced descending subsequence whose FIRST step is t = T-1,
    e.g. T=1000, S=50 -> [999, 979, ..., 19] (Lin et al. 2023 §3.2: sampling
    must start at the terminal timestep or x_T is treated as having leftover
    signal it does not have; required for zero-terminal-SNR schedules)."""
    step = noise_steps / num_inference_steps
    ts = jnp.round(jnp.arange(noise_steps, 0, -step)) - 1
    return ts.astype(jnp.int32)
