#!/usr/bin/env python
"""Quality-vs-steps curve for the sampler zoo (VERDICT r4 next #3).

Measures the claim behind docs/PERFORMANCE.md's step-count guidance
("DPM-Solver++ reaches DDIM-50 quality in ~20-25 steps") with a number:
sampler discretization error decay on a shared model.

Protocol (tiny-model regime as tools/fid_eval.py — no pretrained weights
exist in this environment, so this measures SAMPLER convergence, the part
the framework controls; the model-quality part of FID needs staged SD-1.5
weights, tools/stage_check.py):

1. Build a tiny UNet + schedule and QUICK-TRAIN it (FS_TRAIN_STEPS of
   eps-matching on synthetic context-conditioned data). An untrained net is
   structurally unusable here: its eps_pred ~ 0, so the first solver step's
   x0_pred = x_T/sqrt(abar_T) blows up by 1/sqrt(abar_min) ~ 158x (measured:
   latent RMS 159 with perturbed-only params) and every sampler is then
   compared inside blowup dynamics. A briefly-trained net keeps trajectories
   at unit scale — the regime the solvers are derived for. (Perturbation
   alone also defeats the reference-style zero-init output convs,
   /root/reference/stable_diffusion/modules/util.py zero_module, but not
   the blowup; FS_TRAIN_STEPS=0 falls back to perturb-only for A/B.)
2. TARGET set: DDIM at FS_TARGET_STEPS (200) — the near-converged
   probability-flow solution all deterministic samplers approach.
3. For each (sampler, steps) on the grid: sample the SAME contexts/noise
   seeds, record latent FID to target + paired latent RMSE (deterministic
   samplers share x_T, so per-sample deviation is meaningful; the round-3/4
   latent metric is the discriminative one — FID_PROXY_r04.json).
4. Noise floor: target vs an independent-seed DDIM@target_steps set.

Interpretation: sampler S at k steps "matches DDIM-50" when its latent FID
to target is <= DDIM@50's. DDPM is stochastic: its floor is sampling
variance, read its FID column only.

Prints ONE JSON line. Env: FS_N (256), FS_RES (32), FS_TARGET_STEPS (200),
FS_GRID ("ddim:10,20,25,50;dpmpp:10,15,20,25,50;ddpm:25,50"),
FS_TRAIN_STEPS (400, 0 = perturb-only fallback), FS_POOL (8),
FS_GUIDANCE (2.0), FS_PLATFORM (cpu).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> dict:
    os.environ["JAX_PLATFORMS"] = os.environ.get("FS_PLATFORM", "cpu")
    from stable_diffusion_pytorch_tpu.utils.platform import ensure_platform

    ensure_platform()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn
    from stable_diffusion_pytorch_tpu.models.schedule import (
        DDPMConfig,
        add_noise as sched_add_noise,
        make_schedule,
    )
    from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig
    from stable_diffusion_pytorch_tpu.utils.fid import fid_from_features

    n_images = int(os.environ.get("FS_N", "256"))
    res = int(os.environ.get("FS_RES", "32"))
    target_steps = int(os.environ.get("FS_TARGET_STEPS", "200"))
    grid_spec = os.environ.get(
        "FS_GRID", "ddim:10,20,25,50;dpmpp:10,15,20,25,50;ddpm:25,50"
    )
    grid = []
    for part in grid_spec.split(";"):
        name, _, steps_csv = part.partition(":")
        for tok in steps_csv.split(","):
            if tok.strip():
                grid.append((name.strip(), int(tok)))
    batch = 16
    ctx_dim = 24
    lat = res  # sampled directly in latent space (no VAE: latent metric only)

    unet_cfg = UnetConfig(
        num_res_blocks=1, n_heads=4, attention_resolutions=[1],
        channels_list=[16, 32], time_emb_dim=32, dropout=0.0, n_layers=1,
        context_dim=ctx_dim,
    )
    unet = UNetModel.from_config(4, 4, unet_cfg)
    schedule = make_schedule(DDPMConfig(noise_steps=1000))

    key = jax.random.PRNGKey(0)
    params = unet.init(
        key, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, ctx_dim)),
    )
    guidance = float(os.environ.get("FS_GUIDANCE", "2.0"))
    train_steps = int(os.environ.get("FS_TRAIN_STEPS", "400"))

    # Synthetic context-conditioned data: x0 = (w @ basis) normalized to unit
    # RMS + small residual noise, context tokens carry w. The eps-matching
    # optimum then actually uses the context, so CFG exercises a real
    # conditional/unconditional split instead of amplifying noise.
    rng = np.random.default_rng(0)
    basis = rng.standard_normal((ctx_dim, lat, lat, 4)).astype(np.float32)
    basis /= np.sqrt((basis ** 2).mean(axis=(1, 2, 3), keepdims=True)) * np.sqrt(ctx_dim)
    basis_j = jnp.asarray(basis)

    def make_batch(k, n):
        kw, ke, kn = jax.random.split(k, 3)
        w = jax.random.normal(kw, (n, ctx_dim))
        x0 = jnp.einsum("nc,chwd->nhwd", w, basis_j)
        x0 = x0 + 0.05 * jax.random.normal(ke, x0.shape)
        tok = w[:, None, :] + 0.1 * jax.random.normal(kn, (n, 7, ctx_dim))
        return x0, tok

    if train_steps:
        import optax

        # eps-matching with 10% context dropout (the CFG-training recipe,
        # reference train_unet.py CFG dropout) so the uncond branch is trained
        opt = optax.adam(2e-3)

        def loss_fn(p, x0, tok, t, eps, drop):
            x_t = sched_add_noise(schedule, x0, eps, t)
            tok = jnp.where(drop[:, None, None], jnp.zeros_like(tok), tok)
            pred = unet.apply(p, x_t, t, tok)
            return jnp.mean((pred - eps) ** 2)

        @jax.jit
        def train_step(p, o, k):
            kb, kt, ke, kd = jax.random.split(k, 4)
            x0, tok = make_batch(kb, batch)
            t = jax.random.randint(kt, (batch,), 0, schedule.noise_steps)
            eps = jax.random.normal(ke, x0.shape)
            drop = jax.random.bernoulli(kd, 0.1, (batch,))
            loss, g = jax.value_and_grad(loss_fn)(p, x0, tok, t, eps, drop)
            up, o = opt.update(g, o, p)
            return optax.apply_updates(p, up), o, loss

        opt_state = opt.init(params)
        tkey = jax.random.PRNGKey(7)
        for i in range(train_steps):
            params, opt_state, loss = train_step(
                params, opt_state, jax.random.fold_in(tkey, i)
            )
            if i % 100 == 0 or i == train_steps - 1:
                print(f"# train {i}: loss {float(loss):.4f}", file=sys.stderr,
                      flush=True)
    else:
        # perturb-only fallback (see docstring: blowup regime, A/B use only)
        pert = float(os.environ.get("FS_PERTURB", "0.02"))
        pkey = jax.random.PRNGKey(99)
        leaves = jax.tree_util.tree_leaves_with_path(params)
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [
                v + pert * jax.random.normal(
                    jax.random.fold_in(pkey, i), v.shape, v.dtype
                )
                for i, (_, v) in enumerate(leaves)
            ],
        )

    ctx_bank = np.asarray(
        make_batch(jax.random.PRNGKey(1234), n_images)[1], np.float32
    )
    uncond = np.zeros((1, 7, ctx_dim), np.float32)

    def sample_set(sampler: str, steps: int, seed: int) -> np.ndarray:
        fn = jax.jit(
            make_sample_fn(
                unet, schedule, num_steps=steps, sampler=sampler,
                guidance_scale=guidance,
            )
        )
        key = jax.random.PRNGKey(seed)
        out = []
        for i in range(0, n_images, batch):
            ctx = jnp.asarray(ctx_bank[i : i + batch])
            k = jax.random.fold_in(key, i)
            x_T = jax.random.normal(k, (ctx.shape[0], lat, lat, 4))
            unc = jnp.broadcast_to(jnp.asarray(uncond), ctx.shape)
            out.extend(np.asarray(fn(params, x_T, ctx, unc, k), np.float32))
        return np.stack(out)

    def latent_features(z: np.ndarray) -> np.ndarray:
        # avg-pooled latents; FS_POOL=8 keeps feature dim (res/8)^2*4 well
        # under FS_N so the FID covariance estimate is non-degenerate
        z = z.astype(np.float64)
        n, hh, ww, cc = z.shape
        pool = int(os.environ.get("FS_POOL", "8"))
        ph, pw = hh // pool, ww // pool
        z = z[:, : ph * pool, : pw * pool]
        z = z.reshape(n, ph, pool, pw, pool, cc).mean(axis=(2, 4))
        return z.reshape(n, -1)

    target = sample_set("ddim", target_steps, seed=42)
    target_feat = latent_features(target)
    floor_set = sample_set("ddim", target_steps, seed=4242)
    floor = fid_from_features(target_feat, latent_features(floor_set))

    def rmse(a, b) -> float:
        return float(np.sqrt(np.mean((a.astype(np.float64) - b) ** 2)))

    latent_rms = float(np.sqrt(np.mean(np.square(target.astype(np.float64)))))
    curve = []
    for sampler, steps in grid:
        s = sample_set(sampler, steps, seed=42)
        curve.append(
            {
                "sampler": sampler,
                "steps": steps,
                "fid_latent_vs_target": round(
                    fid_from_features(target_feat, latent_features(s)), 4
                ),
                # paired per-sample deviation: meaningful for the
                # deterministic samplers (same x_T); DDPM's is dominated by
                # its own stochasticity — read its FID column instead
                "rmse_latent_vs_target": round(rmse(s, target), 4),
            }
        )
        print(f"# {sampler}@{steps}: {curve[-1]}", file=sys.stderr, flush=True)

    def fid_of(sampler, steps):
        for row in curve:
            if row["sampler"] == sampler and row["steps"] == steps:
                return row["fid_latent_vs_target"]
        return None

    ddim50 = fid_of("ddim", 50)
    verdicts = {}
    if ddim50 is not None:
        for k in (15, 20, 25):
            f = fid_of("dpmpp", k)
            if f is not None:
                verdicts[f"dpmpp{k}_matches_ddim50"] = bool(f <= ddim50)

    result = {
        "metric": "sampler_quality_vs_steps_latent_fid",
        "n_images": n_images,
        "target": f"ddim@{target_steps}",
        "fid_floor_target_vs_target": round(floor, 4),
        "latent_rms": round(latent_rms, 4),
        "curve": curve,
        **verdicts,
    }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
