"""Pure jittable train/eval steps for the UNet and VAE trainers.

TPU-native re-design of the reference's ``__one_step`` bodies
(/root/reference/train_unet.py:489-529, train_autoencoder.py:487-507): the whole
step — frozen CLIP text encode, frozen VAE encode, q-sample, UNet forward,
loss, backward, clip, AdamW update — is ONE jitted XLA program. Under a data
mesh the batch is sharded on axis 0 and params are replicated, so XLA inserts
the gradient psum over ICI automatically (the DDP allreduce analog,
train_unet.py:367).

PRNG: every stochastic choice (noise, timesteps, posterior sample, CFG dropout)
derives from an explicit per-step key (the reference relies on torch global RNG,
train_unet.py:505-518).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stable_diffusion_pytorch_tpu.models import schedule as sched_lib
from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_pred_noise_fn
from stable_diffusion_pytorch_tpu.models.schedule import DiffusionSchedule


@struct.dataclass
class TrainState:
    """Minimal functional train state: params + optimizer state + step count,
    with optional EMA shadow params (exponential moving average — standard SD
    training practice the reference lacks; sampled-image quality improves when
    sampling from the EMA weights)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None

    @classmethod
    def create(
        cls, params, tx: optax.GradientTransformation, with_ema: bool = False
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if with_ema else None,
        )


def _ema_update(ema_params, new_params, decay):
    """EMA shadow update; ``decay`` may be a traced scalar (1.0 = no-op, used on
    gradient-accumulation micro-steps where params did not actually change —
    otherwise the configured decay would compound as decay^accum per optimizer
    update)."""
    if ema_params is None:
        return None
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        new_params,
    )


def _ema_decay_at(step, ema_decay: float, accum: int):
    """Effective decay for micro-step ``step`` (0-based): the real decay only on
    the sync micro-step where optax.MultiSteps applies the update, 1.0 (no-op)
    otherwise."""
    if accum <= 1:
        return ema_decay
    sync = (step + 1) % accum == 0
    return jnp.where(sync, jnp.float32(ema_decay), jnp.float32(1.0))


def _optimizer_step(tx, grads, opt_state, params):
    """One optimizer application. Fused transforms (trainers/fused_adamw.py)
    expose ``apply`` producing new params directly — one HBM pass per leaf;
    plain optax transforms go through update + apply_updates."""
    if hasattr(tx, "apply"):
        return tx.apply(grads, opt_state, params)
    updates, new_opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state


def _gns_grads(grad_fn, batch, key):
    """Half-batch gradient split for the gradient-noise-scale estimator
    (McCandlish et al. 2018, "An Empirical Model of Large-Batch Training").

    ``grad_fn(sub_batch, sub_key) -> (loss, grads)``. Computes grads over the
    two batch halves (same total FLOPs as one full-batch backward), averages
    them into the usual full-batch gradient, and returns the two unbiased
    estimator ingredients:
      S   = (|g_small|^2 - |g_big|^2) / (1/B_small - 1/B_big)   (noise scale)
      G^2 = (B_big |g_big|^2 - B_small |g_small|^2) / (B_big - B_small)
    The trainer EMA-smooths S and G^2 across steps and reports B_noise = S/G^2.
    Returns (loss, grads, {"gns_s", "gns_g2"}).
    """
    bsz = next(iter(batch.values())).shape[0]
    half = bsz // 2
    k1, k2 = jax.random.split(key)
    b1 = jax.tree_util.tree_map(lambda x: x[:half], batch)
    b2 = jax.tree_util.tree_map(lambda x: x[half:], batch)
    l1, g1 = grad_fn(b1, k1)
    l2, g2 = grad_fn(b2, k2)
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) * 0.5, g1, g2)
    loss = (l1 + l2) * 0.5
    g_big2 = optax.global_norm(grads) ** 2
    g_small2 = (optax.global_norm(g1) ** 2 + optax.global_norm(g2) ** 2) * 0.5
    # B_small = half, B_big = 2*half: the denominators simplify to
    #   S = 2*half*(g_small2 - g_big2),  G2 = 2*g_big2 - g_small2
    extras = {
        "gns_s": 2.0 * half * (g_small2 - g_big2),
        "gns_g2": 2.0 * g_big2 - g_small2,
    }
    return loss, grads, extras


def make_unet_train_step(
    unet_module,
    clip_module,
    vae_module,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    guidance_scale: float = 7.5,
    train_with_cfg: bool = False,
    reference_cfg_formula: bool = False,
    cfg_dropout_prob: float = 0.1,
    whole_batch_cfg_dropout: bool = False,
    remat: bool = False,  # deprecated: per-block remat lives in UNetModel(remat=True)
    ema_decay: float = 0.0,
    random_flip: bool = False,
    gradient_accumulation_steps: int = 1,
    grad_noise_scale: bool = False,
    prediction_type: str = "epsilon",
    snr_gamma: float = 0.0,
    noise_offset: float = 0.0,
    input_perturbation: float = 0.0,
    param_transform: Optional[Callable] = None,
    prior_loss_weight: float = 0.0,
) -> Tuple[Callable, Callable]:
    """Build (train_step, eval_step) for latent-diffusion fine-tuning.

    Capability extensions beyond the reference's eps-MSE objective
    (train_unet.py:529): ``prediction_type="v_prediction"`` trains the
    SD-2.x-style v-objective (Salimans & Ho 2022), and ``snr_gamma > 0``
    applies Min-SNR-gamma per-example loss weights (Hang et al. 2023).
    ``prior_loss_weight > 0`` enables the DreamBooth prior-preservation
    objective (Ruiz et al. 2022): batches interleave instance rows (even
    indices) with class rows (odd indices — see
    utils/data.py:dreambooth_collate; interleaving keeps both populations on
    every device under data-parallel sharding), and
    loss = MSE(instance) + w * MSE(class).

    train_step(state, clip_params, vae_params, batch, uncond_ids, key)
        -> (new_state, metrics)
    eval_step(params, clip_params, vae_params, batch, uncond_ids, key) -> loss

    batch: {"pixel_values": [B,H,W,3] in [-1,1], "input_ids": [B,S]} or
    {"latents": [B,h,w,c] (precomputed VAE-latent cache), "input_ids": [B,S]}.

    Reference behaviors reproduced:
    - 10% empty-prompt dropout; the reference swaps the WHOLE batch at once
      (train_unet.py:518-521) — ``whole_batch_cfg_dropout`` replicates that,
      the default drops per-example (standard SD practice).
    - ``train_with_cfg`` regresses the CFG-combined doubled forward like
      train_unet.py:526-528 (guidance 7.5 during training); default is the
      single conditional forward.
    - loss: MSE(pred, noise) in float32 (train_unet.py:529).
    """
    # NOTE: whole-function jax.checkpoint here does NOT reduce peak memory (the
    # backward recompute rematerializes every residual at once; measured OOM at
    # batch 16). Use UNetModel(remat=True) for per-block rematerialization.
    unet_apply = unet_module.apply

    pred_noise = make_pred_noise_fn(
        unet_module,
        guidance_scale if train_with_cfg else 1.0,
        reference_cfg_formula,
    )

    def prepare_inputs(clip_params, vae_params, batch, uncond_ids, key):
        """Frozen encoders + q-sample; shared by train and eval."""
        k_sample, k_noise, k_t, k_drop, k_pre, k_off, k_ip = jax.random.split(key, 7)
        if "moments" in batch:
            # VAE-latent cache ships posterior moments; draw the fresh latent
            # sample here from the per-step key so each epoch (and each resume
            # replay) gets a new draw — numerically equivalent to reference
            # training which re-samples the posterior every access
            # (train_unet.py:502-504), minus the encoder FLOPs.
            m = batch["moments"]
            c = m.shape[-1] // 2
            mean, log_var = m[..., :c], m[..., c:]
            eps = jax.random.normal(k_sample, mean.shape, mean.dtype)
            latents = mean + jnp.exp(0.5 * log_var) * eps
        elif "latents" in batch:
            latents = batch["latents"]
        else:
            if "raw_images" in batch:
                # on-device preprocessing: uint8 -> [-1,1] (+ flip) inside jit
                from stable_diffusion_pytorch_tpu.utils.preprocess import (
                    device_preprocess,
                )

                pixels = device_preprocess(
                    batch["raw_images"],
                    batch["raw_images"].shape[1],
                    center_crop=True,
                    random_flip=random_flip,
                    key=k_pre if random_flip else None,
                )
            else:
                pixels = batch["pixel_values"]
            posterior = vae_module.apply(
                vae_params, pixels, method=vae_module.encode
            )
            latents = posterior.latent_dist.sample(k_sample)
        latents = jax.lax.stop_gradient(latents)
        bsz = latents.shape[0]

        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        if noise_offset > 0.0:
            # offset noise: a per-(example, channel) DC shift teaches the
            # model to move global brightness, which pure high-frequency
            # Gaussian noise under-trains
            off = jax.random.normal(
                k_off, (bsz,) + (1,) * (latents.ndim - 2) + latents.shape[-1:],
                latents.dtype,
            )
            noise = noise + jnp.asarray(noise_offset, latents.dtype) * off
        timesteps = jax.random.randint(k_t, (bsz,), 0, schedule.noise_steps)
        if input_perturbation > 0.0:
            # perturb only the q-sample input; the regression target stays the
            # unperturbed noise (Ning et al. 2023)
            ip = jax.random.normal(k_ip, latents.shape, latents.dtype)
            noisy = noise + jnp.asarray(input_perturbation, latents.dtype) * ip
            x_t = sched_lib.add_noise(schedule, latents, noisy, timesteps)
        else:
            x_t = sched_lib.add_noise(schedule, latents, noise, timesteps)

        if "context_emb" in batch:
            # cached text embeddings (latent-cache pipeline): no CLIP forward;
            # ``uncond_ids`` carries the cached uncond EMBEDDING [S, D] here
            context = batch["context_emb"]
            uncond_row = uncond_ids.astype(context.dtype)
            uncond_bcast = jnp.broadcast_to(uncond_row[None], context.shape)
            if whole_batch_cfg_dropout:
                drop = jax.random.uniform(k_drop, ()) < cfg_dropout_prob
            else:
                drop = jax.random.uniform(k_drop, (bsz, 1, 1)) < cfg_dropout_prob
            context = jnp.where(drop, uncond_bcast, context)
            uncond_emb = uncond_bcast if train_with_cfg else None
            return x_t, timesteps, context, uncond_emb, noise, latents

        # empty-prompt dropout on token ids (before the text encoder so the
        # encode is a single batched forward)
        input_ids = batch["input_ids"]
        uncond_batch = jnp.broadcast_to(uncond_ids[None], input_ids.shape)
        if whole_batch_cfg_dropout:
            drop = jax.random.uniform(k_drop, ()) < cfg_dropout_prob
            input_ids = jnp.where(drop, uncond_batch, input_ids)
        else:
            drop = jax.random.uniform(k_drop, (bsz, 1)) < cfg_dropout_prob
            input_ids = jnp.where(drop, uncond_batch, input_ids)

        context = clip_module.apply(clip_params, input_ids)
        context = jax.lax.stop_gradient(context)
        if train_with_cfg:
            uncond_emb = clip_module.apply(clip_params, uncond_batch)
            uncond_emb = jax.lax.stop_gradient(uncond_emb)
        else:
            uncond_emb = None
        return x_t, timesteps, context, uncond_emb, noise, latents

    def loss_fn(unet_params, clip_params, vae_params, batch, uncond_ids, key):
        if param_transform is not None:
            # e.g. LoRA: ``unet_params`` is the small trainable tree; the
            # transform merges it into the frozen base weights (differentiable,
            # so the gradient lands on the small tree)
            unet_params = param_transform(unet_params)
        x_t, t, ctx, uncond_emb, noise, latents = prepare_inputs(
            clip_params, vae_params, batch, uncond_ids, key
        )
        if train_with_cfg:
            pred = pred_noise(unet_params, x_t, t, ctx, uncond_emb)
        else:
            pred = unet_apply(unet_params, x_t, t, ctx)
        if prediction_type == "v_prediction":
            alpha, sigma_vp = sched_lib.alpha_sigma_at(schedule, t)
            alpha = sched_lib._bcast(alpha, x_t).astype(jnp.float32)
            sigma_vp = sched_lib._bcast(sigma_vp, x_t).astype(jnp.float32)
            target = sched_lib.v_from_eps_x0(
                latents.astype(jnp.float32), noise.astype(jnp.float32), alpha, sigma_vp
            )
        else:
            target = noise.astype(jnp.float32)
        sq = (pred.astype(jnp.float32) - target) ** 2
        if snr_gamma > 0.0 or prior_loss_weight > 0.0:
            per_example = jnp.mean(sq.reshape(sq.shape[0], -1), axis=1)
            if snr_gamma > 0.0:
                w = sched_lib.min_snr_weight(schedule, t, snr_gamma, prediction_type)
                per_example = w * per_example
            if prior_loss_weight > 0.0:
                # even rows = instance, odd rows = class (prior)
                return jnp.mean(per_example[0::2]) + prior_loss_weight * jnp.mean(
                    per_example[1::2]
                )
            return jnp.mean(per_example)
        return jnp.mean(sq)

    def train_step(state: TrainState, clip_params, vae_params, batch, uncond_ids, key):
        if grad_noise_scale:
            loss, grads, extras = _gns_grads(
                lambda b, k: jax.value_and_grad(loss_fn)(
                    state.params, clip_params, vae_params, b, uncond_ids, k
                ),
                batch,
                key,
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, clip_params, vae_params, batch, uncond_ids, key
            )
            extras = {}
        new_params, new_opt_state = _optimizer_step(
            tx, grads, state.opt_state, state.params
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **extras}
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=_ema_update(
                    state.ema_params,
                    new_params,
                    _ema_decay_at(state.step, ema_decay, gradient_accumulation_steps),
                ),
            ),
            metrics,
        )

    def eval_step(unet_params, clip_params, vae_params, batch, uncond_ids, key):
        return loss_fn(unet_params, clip_params, vae_params, batch, uncond_ids, key)

    return train_step, eval_step


def make_textual_inversion_train_step(
    unet_module,
    clip_module,
    vae_module,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    placeholder_ids,
    ema_decay: float = 0.0,
    gradient_accumulation_steps: int = 1,
) -> Tuple[Callable, Callable]:
    """Build (train_step, eval_step) for textual inversion (Gal et al. 2022,
    "An Image is Worth One Word"). No reference counterpart (capability
    extension; the ecosystem analog is diffusers' textual_inversion.py).

    Everything is frozen — UNet, VAE, the whole CLIP tower — except K learned
    embedding vectors injected wherever ``placeholder_ids`` appear in the
    prompt (see CLIPTextTransformer token_overrides). The trainable state is
    ``{"ti": [K, 768]}``: a few thousand parameters, so the optimizer state is
    negligible and checkpoints are KB-sized.

    train_step(state, unet_params, clip_params, vae_params, batch, key)
        -> (new_state, metrics)
    eval_step(ti_params, unet_params, clip_params, vae_params, batch, key)
        -> loss
    """
    pids = jnp.asarray(placeholder_ids, jnp.int32)

    def loss_fn(ti_params, unet_params, clip_params, vae_params, batch, key):
        k_sample, k_noise, k_t = jax.random.split(key, 3)
        if "latents" in batch:
            latents = batch["latents"]
        else:
            posterior = vae_module.apply(
                vae_params, batch["pixel_values"], method=vae_module.encode
            )
            latents = posterior.latent_dist.sample(k_sample)
        latents = jax.lax.stop_gradient(latents)
        bsz = latents.shape[0]

        context = clip_module.apply(
            clip_params, batch["input_ids"], token_overrides=(pids, ti_params["ti"])
        )

        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        timesteps = jax.random.randint(k_t, (bsz,), 0, schedule.noise_steps)
        x_t = sched_lib.add_noise(schedule, latents, noise, timesteps)
        eps = unet_module.apply(unet_params, x_t, timesteps, context)
        return jnp.mean((eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)

    def train_step(state: TrainState, unet_params, clip_params, vae_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, unet_params, clip_params, vae_params, batch, key
        )
        new_params, new_opt_state = _optimizer_step(
            tx, grads, state.opt_state, state.params
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=_ema_update(
                    state.ema_params,
                    new_params,
                    _ema_decay_at(state.step, ema_decay, gradient_accumulation_steps),
                ),
            ),
            metrics,
        )

    def eval_step(ti_params, unet_params, clip_params, vae_params, batch, key):
        return loss_fn(ti_params, unet_params, clip_params, vae_params, batch, key)

    return train_step, eval_step


def make_controlnet_train_step(
    controlled_module,
    clip_module,
    vae_module,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    cfg_dropout_prob: float = 0.5,
    ema_decay: float = 0.0,
    gradient_accumulation_steps: int = 1,
) -> Tuple[Callable, Callable]:
    """Build (train_step, eval_step) for ControlNet training (Zhang et al.
    2023). No reference counterpart (ecosystem analog: diffusers
    train_controlnet.py). The UNet, VAE and CLIP are frozen; only the control
    branch (encoder copy + hint embedding + zero convs) trains.

    ``cfg_dropout_prob`` defaults to 0.5: the paper drops the text prompt half
    the time so the control branch learns to steer WITHOUT language support.

    train_step(state, unet_params, clip_params, vae_params, batch, uncond_ids, key)
        -> (new_state, metrics)
    eval_step(cn_params, unet_params, clip_params, vae_params, batch, uncond_ids, key)
        -> loss

    batch adds ``hint`` [B, H, W, C] (pixel-space conditioning, [-1,1]) to the
    usual pixel_values/latents + input_ids keys.
    """

    def loss_fn(cn_params, unet_params, clip_params, vae_params, batch, uncond_ids, key):
        k_sample, k_noise, k_t, k_drop = jax.random.split(key, 4)
        if "latents" in batch:
            latents = batch["latents"]
        else:
            posterior = vae_module.apply(
                vae_params, batch["pixel_values"], method=vae_module.encode
            )
            latents = posterior.latent_dist.sample(k_sample)
        latents = jax.lax.stop_gradient(latents)
        bsz = latents.shape[0]

        input_ids = batch["input_ids"]
        uncond_batch = jnp.broadcast_to(uncond_ids[None], input_ids.shape)
        drop = jax.random.uniform(k_drop, (bsz, 1)) < cfg_dropout_prob
        input_ids = jnp.where(drop, uncond_batch, input_ids)
        context = jax.lax.stop_gradient(clip_module.apply(clip_params, input_ids))

        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        timesteps = jax.random.randint(k_t, (bsz,), 0, schedule.noise_steps)
        x_t = sched_lib.add_noise(schedule, latents, noise, timesteps)

        up = unet_params["params"] if "params" in unet_params else unet_params
        cp = cn_params["params"] if "params" in cn_params else cn_params
        eps = controlled_module.apply(
            {"params": {"unet": up, "controlnet": cp}},
            x_t,
            timesteps,
            context,
            batch["hint"].astype(x_t.dtype),
        )
        return jnp.mean((eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)

    def train_step(state: TrainState, unet_params, clip_params, vae_params,
                   batch, uncond_ids, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, unet_params, clip_params, vae_params, batch,
            uncond_ids, key,
        )
        new_params, new_opt_state = _optimizer_step(
            tx, grads, state.opt_state, state.params
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=_ema_update(
                    state.ema_params,
                    new_params,
                    _ema_decay_at(state.step, ema_decay, gradient_accumulation_steps),
                ),
            ),
            metrics,
        )

    def eval_step(cn_params, unet_params, clip_params, vae_params, batch,
                  uncond_ids, key):
        return loss_fn(
            cn_params, unet_params, clip_params, vae_params, batch, uncond_ids, key
        )

    return train_step, eval_step


def make_vae_train_step(
    vae_module,
    tx: optax.GradientTransformation,
    kl_weight: float = 1.0,
    kl_per_example0: bool = False,
    ema_decay: float = 0.0,
    random_flip: bool = False,
    gradient_accumulation_steps: int = 1,
    grad_noise_scale: bool = False,
) -> Tuple[Callable, Callable]:
    """Build (train_step, eval_step) for KL-VAE training.

    Loss = MSE(img, recon) + kl_weight * KL (train_autoencoder.py:499-507).
    The reference takes example 0's KL (``dist.kl()[0]``) — a bug kept behind
    ``kl_per_example0``; the fixed default uses the batch mean (this is
    BASELINE.json config #4's "fix the broken reference path").
    """

    def loss_fn(vae_params, batch, key):
        if "raw_images" in batch:  # --device-preprocess path
            from stable_diffusion_pytorch_tpu.utils.preprocess import (
                device_preprocess,
            )

            key, k_pre = jax.random.split(key)
            img = device_preprocess(
                batch["raw_images"],
                batch["raw_images"].shape[1],
                center_crop=True,
                random_flip=random_flip,
                key=k_pre if random_flip else None,
            )
        else:
            img = batch["pixel_values"]
        recon, posterior = vae_module.apply(vae_params, img, sample_key=key)
        recon_loss = jnp.mean(
            (img.astype(jnp.float32) - recon.astype(jnp.float32)) ** 2
        )
        kl = posterior.latent_dist.kl()
        kl_loss = kl[0] if kl_per_example0 else jnp.mean(kl)
        loss = recon_loss + kl_weight * kl_loss
        return loss, {"recon_loss": recon_loss, "kl_loss": kl_loss}

    def train_step(state: TrainState, batch, key):
        if grad_noise_scale:
            def vg(b, k):
                (l, _parts), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, b, k
                )
                return l, g

            loss, grads, extras = _gns_grads(vg, batch, key)
            # recon/kl parts are not re-derived on the GNS path (loss only)
            parts = {}
        else:
            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, key
            )
            extras = {}
        new_params, new_opt_state = _optimizer_step(
            tx, grads, state.opt_state, state.params
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **parts, **extras}
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=_ema_update(
                    state.ema_params,
                    new_params,
                    _ema_decay_at(state.step, ema_decay, gradient_accumulation_steps),
                ),
            ),
            metrics,
        )

    def eval_step(vae_params, batch, key):
        loss, _ = loss_fn(vae_params, batch, key)
        return loss

    return train_step, eval_step
