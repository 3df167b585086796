"""Sigma-space (k-diffusion convention) sampler tests: euler, euler_a, heun,
dpmpp_sde, Karras spacing, and the VP<->sigma conversion machinery.

The analytic tests use a delta-distribution denoiser (the true eps model for
data concentrated at a known mu): every correct ODE/SDE sampler must land
EXACTLY on mu at sigma=0, and for this linear ODE the Euler trajectory is
exact at every step — so these are equality tests, not just smoke tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.models import schedule as sched_lib
from stable_diffusion_pytorch_tpu.models.latent_diffusion import (
    SIGMA_SPACE_SAMPLERS,
    make_sample_fn,
)
from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(DDPMConfig(noise_steps=100))


@pytest.fixture(scope="module")
def tiny():
    unet = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[32, 64], n_heads=4, time_emb_dim=64, n_layers=1)
    )
    x = jax.random.normal(KEY, (2, 8, 8, 4))
    ctx = jax.random.normal(KEY, (2, 77, 768))
    params = unet.init(KEY, x, jnp.zeros((2,), jnp.int32), ctx)
    sched = make_schedule(DDPMConfig(noise_steps=50))
    return unet, params, sched, x, ctx


# --------------------------------------------------------------------------- #
# table / conversion machinery
# --------------------------------------------------------------------------- #


def test_vp_sigmas_monotone_and_consistent(sched):
    sig = np.asarray(sched_lib.vp_sigmas(sched))
    assert (np.diff(sig) > 0).all(), "sigma(t) must increase with t"
    ab = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(sig, np.sqrt((1 - ab) / ab), rtol=1e-6)


def test_t_from_sigma_roundtrip(sched):
    """t_from_sigma inverts the table at the grid points."""
    tab = sched_lib.vp_sigmas(sched)
    for k in [0, 7, 42, 99]:
        t = float(sched_lib.t_from_sigma(sched, tab[k]))
        assert abs(t - k) < 1e-3, (k, t)


def test_karras_sigmas_endpoints_and_order(sched):
    tab = sched_lib.vp_sigmas(sched)
    sig = np.asarray(sched_lib.karras_sigmas(tab[0], tab[99], 20))
    assert sig.shape == (20,)
    np.testing.assert_allclose(sig[0], float(tab[99]), rtol=1e-5)
    np.testing.assert_allclose(sig[-1], float(tab[0]), rtol=1e-5)
    assert (np.diff(sig) < 0).all(), "karras sigmas must be descending"


def test_ancestral_sigmas_preserve_marginal(sched):
    s, s_next = jnp.asarray(2.0), jnp.asarray(1.0)
    down, up = sched_lib.ancestral_sigmas(s, s_next, eta=1.0)
    np.testing.assert_allclose(float(down**2 + up**2), 1.0, rtol=1e-6)
    # eta=0 degenerates to the deterministic ODE step
    down0, up0 = sched_lib.ancestral_sigmas(s, s_next, eta=0.0)
    assert float(up0) == 0.0 and abs(float(down0) - 1.0) < 1e-6


# --------------------------------------------------------------------------- #
# analytic delta-model: data concentrated at mu -> D(x, sigma) = mu exactly,
# i.e. eps(x_vp, t) = x_vp / sqrt(1 - abar_t) - sqrt(abar/(1-abar)) * mu
# --------------------------------------------------------------------------- #


class DeltaUNet:
    """Fake eps-model whose implied denoiser is D(x) = mu for any sigma.

    apply(params, x_vp, t, ctx) with fractional float t: abar is recovered by
    interpolating the log-sigma table exactly like the sampler does, so the
    wrapper's sigma and the model's sigma agree to float precision.
    """

    dtype = jnp.float32

    def __init__(self, sched, mu):
        self.sched = sched
        self.mu = mu
        self.log_tab = jnp.log(sched_lib.vp_sigmas(sched))

    def apply(self, params, x, t, ctx):
        log_sig = jnp.interp(
            t.astype(jnp.float32),
            jnp.arange(self.sched.noise_steps, dtype=jnp.float32),
            self.log_tab,
        )
        sigma = jnp.exp(log_sig).reshape((-1,) + (1,) * (x.ndim - 1))
        # x_vp = (x_sigma) / sqrt(1+sigma^2); x_sigma = mu + sigma * eps
        c_in = 1.0 / jnp.sqrt(1.0 + sigma**2)
        x_sigma = x / c_in
        return (x_sigma - self.mu) / sigma


@pytest.mark.parametrize("sampler", ["euler", "heun", "dpmpp_sde"])
@pytest.mark.parametrize("karras", [False, True])
def test_delta_model_converges_exactly(sched, sampler, karras):
    mu = 0.7
    model = DeltaUNet(sched, mu)
    fn = jax.jit(
        make_sample_fn(
            model, sched, 8, sampler=sampler, guidance_scale=1.0, karras=karras
        )
    )
    x_T = jax.random.normal(KEY, (2, 4, 4, 3))
    ctx = jnp.zeros((2, 77, 8))
    out = np.asarray(fn(None, x_T, ctx, None, KEY))
    np.testing.assert_allclose(out, mu, atol=2e-3)


def test_euler_a_converges_statistically(sched):
    """Ancestral noise cancels at sigma=0: terminal value is exactly mu."""
    mu = -0.3
    model = DeltaUNet(sched, mu)
    fn = jax.jit(
        make_sample_fn(model, sched, 10, sampler="euler_a", guidance_scale=1.0)
    )
    x_T = jax.random.normal(KEY, (2, 4, 4, 3))
    ctx = jnp.zeros((2, 77, 8))
    out = np.asarray(fn(None, x_T, ctx, None, KEY))
    np.testing.assert_allclose(out, mu, atol=5e-3)


def test_euler_matches_analytic_trajectory(sched):
    """For the delta model the ODE is linear: Euler is EXACT, so the result
    must equal mu + (x_T*sqrt(1+s0^2) - mu) * (0/s0) = mu regardless of step
    count — even with a single step."""
    mu = 1.5
    model = DeltaUNet(sched, mu)
    fn = jax.jit(make_sample_fn(model, sched, 1, sampler="euler", guidance_scale=1.0))
    x_T = jax.random.normal(KEY, (1, 2, 2, 1))
    out = np.asarray(fn(None, x_T, jnp.zeros((1, 77, 8)), None, KEY))
    np.testing.assert_allclose(out, mu, atol=1e-3)


def test_sigma_sampler_agrees_with_ddim_on_delta_model(sched):
    """DDIM (discrete grid) and Euler (sigma space) solve the same ODE; on the
    delta model both are exact, so they agree to float tolerance."""
    mu = 0.25
    model = DeltaUNet(sched, mu)
    x_T = jax.random.normal(KEY, (1, 4, 4, 2))
    ctx = jnp.zeros((1, 77, 8))
    ddim = jax.jit(make_sample_fn(model, sched, 10, sampler="ddim", guidance_scale=1.0))
    euler = jax.jit(make_sample_fn(model, sched, 10, sampler="euler", guidance_scale=1.0))
    a = np.asarray(ddim(None, x_T, ctx, None, KEY))
    b = np.asarray(euler(None, x_T, ctx, None, KEY))
    np.testing.assert_allclose(a, b, atol=5e-3)


# --------------------------------------------------------------------------- #
# real tiny UNet: jit + shape + determinism properties
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("sampler", SIGMA_SPACE_SAMPLERS)
def test_sigma_samplers_jit_and_run(tiny, sampler):
    unet, params, sched, x, ctx = tiny
    fn = jax.jit(
        make_sample_fn(unet, sched, 4, sampler=sampler, guidance_scale=7.5, karras=True)
    )
    out = fn(params, x, ctx, jnp.zeros_like(ctx), KEY)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_euler_deterministic_heun_differs(tiny):
    unet, params, sched, x, ctx = tiny
    euler = jax.jit(make_sample_fn(unet, sched, 4, sampler="euler", guidance_scale=1.5))
    a = euler(params, x, ctx, jnp.zeros_like(ctx), jax.random.PRNGKey(1))
    b = euler(params, x, ctx, jnp.zeros_like(ctx), jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    heun = jax.jit(make_sample_fn(unet, sched, 4, sampler="heun", guidance_scale=1.5))
    h = heun(params, x, ctx, jnp.zeros_like(ctx), jax.random.PRNGKey(1))
    # 2nd-order correction must actually change the result
    assert not np.allclose(np.asarray(a), np.asarray(h))


def test_euler_a_stochastic_across_keys(tiny):
    unet, params, sched, x, ctx = tiny
    fn = jax.jit(make_sample_fn(unet, sched, 4, sampler="euler_a", guidance_scale=1.5))
    a = fn(params, x, ctx, jnp.zeros_like(ctx), jax.random.PRNGKey(1))
    b = fn(params, x, ctx, jnp.zeros_like(ctx), jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_img2img_strength_truncates_sigma_schedule(tiny):
    unet, params, sched, x, ctx = tiny
    fn = make_sample_fn(
        unet, sched, 8, sampler="euler", guidance_scale=1.0, strength=0.5
    )
    # start timestep must come from the truncated (later) part of the schedule
    full = make_sample_fn(unet, sched, 8, sampler="euler", guidance_scale=1.0)
    assert fn.start_timestep < full.start_timestep
    out = jax.jit(fn)(params, x, ctx, jnp.zeros_like(ctx), KEY)
    assert bool(jnp.isfinite(out).all())


# --------------------------------------------------------------------------- #
# v-prediction objective (SD-2.x style) + Min-SNR weights
# --------------------------------------------------------------------------- #


def test_v_eps_conversion_identities(sched):
    """eps -> v -> eps round-trips exactly (alpha^2 + sigma^2 = 1)."""
    key1, key2 = jax.random.split(KEY)
    x0 = jax.random.normal(key1, (3, 4, 4, 2))
    eps = jax.random.normal(key2, (3, 4, 4, 2))
    t = jnp.asarray([0, 42, 99])
    alpha, sigma = sched_lib.alpha_sigma_at(sched, t)
    alpha = alpha.reshape(-1, 1, 1, 1)
    sigma = sigma.reshape(-1, 1, 1, 1)
    x_t = alpha * x0 + sigma * eps
    v = sched_lib.v_from_eps_x0(x0, eps, alpha, sigma)
    np.testing.assert_allclose(
        np.asarray(sched_lib.eps_from_v(x_t, v, alpha, sigma)),
        np.asarray(eps),
        atol=1e-5,
    )
    # and x0 = alpha*x_t - sigma*v
    np.testing.assert_allclose(
        np.asarray(alpha * x_t - sigma * v), np.asarray(x0), atol=1e-5
    )


def test_min_snr_weight_formulas(sched):
    t = jnp.arange(sched.noise_steps)
    snr = np.asarray(sched_lib.snr_at(sched, t))
    w_eps = np.asarray(sched_lib.min_snr_weight(sched, t, 5.0, "epsilon"))
    w_v = np.asarray(sched_lib.min_snr_weight(sched, t, 5.0, "v_prediction"))
    np.testing.assert_allclose(w_eps, np.minimum(snr, 5.0) / snr, rtol=1e-5)
    np.testing.assert_allclose(w_v, np.minimum(snr, 5.0) / (snr + 1.0), rtol=1e-5)
    # eps weights: exactly 1 where snr <= gamma, < 1 above
    assert np.all(w_eps[snr <= 5.0] == 1.0) and np.all(w_eps[snr > 5.0] < 1.0)


class DeltaVUNet(DeltaUNet):
    """v-prediction twin of DeltaUNet: emits the exact v for delta-at-mu data,
    so a correct v->eps conversion makes every sampler land exactly on mu."""

    def apply(self, params, x, t, ctx):
        log_sig = jnp.interp(
            t.astype(jnp.float32),
            jnp.arange(self.sched.noise_steps, dtype=jnp.float32),
            self.log_tab,
        )
        sigma = jnp.exp(log_sig).reshape((-1,) + (1,) * (x.ndim - 1))
        alpha_vp = 1.0 / jnp.sqrt(1.0 + sigma**2)
        sigma_vp = sigma * alpha_vp
        # true eps for x0 == mu, from the VP-space input x
        eps = (x - alpha_vp * self.mu) / sigma_vp
        x0 = jnp.full_like(x, self.mu)
        return sched_lib.v_from_eps_x0(x0, eps, alpha_vp, sigma_vp)


@pytest.mark.parametrize("sampler", ["ddim", "euler", "dpmpp"])
def test_v_prediction_sampling_converges(sched, sampler):
    mu = 0.4
    model = DeltaVUNet(sched, mu)
    fn = jax.jit(
        make_sample_fn(
            model, sched, 8, sampler=sampler, guidance_scale=1.0,
            prediction_type="v_prediction",
        )
    )
    x_T = jax.random.normal(KEY, (2, 4, 4, 3))
    out = np.asarray(fn(None, x_T, jnp.zeros((2, 77, 8)), None, KEY))
    np.testing.assert_allclose(out, mu, atol=5e-3)


def test_v_train_step_targets_v(sched):
    """With a model that outputs the EXACT v target, the v-prediction loss is
    ~0 while the eps loss is large (they differ unless alpha=1)."""
    import optax

    from stable_diffusion_pytorch_tpu.trainers.steps import (
        TrainState,
        make_unet_train_step,
    )

    class EchoVModule:
        """Replays the true v computed from the batch's known latents+noise via
        closure on test-provided arrays keyed by the traced timestep."""

        dtype = jnp.float32

        def __init__(self):
            self.call = None

        def apply(self, params, x_t, t, ctx):
            alpha, sigma = sched_lib.alpha_sigma_at(sched, t)
            alpha = alpha.reshape(-1, 1, 1, 1)
            sigma = sigma.reshape(-1, 1, 1, 1)
            # reconstruct eps from (x_t, latents): eps = (x_t - alpha x0)/sigma
            x0 = params["x0"]
            eps = (x_t - alpha * x0) / sigma
            return sched_lib.v_from_eps_x0(x0, eps, alpha, sigma)

    latents = jax.random.normal(KEY, (2, 4, 4, 3))
    batch = {"latents": latents, "context_emb": jnp.zeros((2, 77, 8))}
    tx = optax.sgd(0.0)
    module = EchoVModule()

    for ptype, expect_zero in [("v_prediction", True), ("epsilon", False)]:
        train_step, _ = make_unet_train_step(
            module, None, None, sched, tx,
            train_with_cfg=False, cfg_dropout_prob=0.0, prediction_type=ptype,
        )
        state = TrainState.create({"x0": latents}, tx)
        _, metrics = jax.jit(train_step)(
            state, None, None, batch, jnp.zeros((77, 8)), KEY
        )
        loss = float(metrics["loss"])
        if expect_zero:
            assert loss < 1e-8, loss
        else:
            assert loss > 0.1, loss


# --------------------------------------------------------------------------- #
# zero-terminal-SNR schedule + trailing spacing + guidance rescale
# --------------------------------------------------------------------------- #


class DeltaVPModel:
    """Exact v-model for delta-at-mu data, computed in VP space directly from
    the schedule tables — valid at alpha_bar = 0 (the sigma-space twin
    DeltaVUNet can't represent sigma = inf)."""

    dtype = jnp.float32

    def __init__(self, sched, mu):
        self.sched = sched
        self.mu = mu

    def apply(self, params, x, t, ctx):
        ab = self.sched.alphas_cumprod[t.astype(jnp.int32)]
        ab = ab.reshape((-1,) + (1,) * (x.ndim - 1))
        alpha = jnp.sqrt(ab)
        sigma = jnp.sqrt(jnp.maximum(1.0 - ab, 1e-12))
        # v = alpha*eps - sigma*x0 with eps = (x - alpha*mu)/sigma
        # simplifies to (alpha*x - mu) / sigma  (using alpha^2 + sigma^2 = 1)
        return (alpha * x - self.mu) / sigma


@pytest.mark.parametrize("sampler", ["ddim", "dpmpp"])
def test_zero_snr_trailing_vpred_converges(sampler):
    """On a zero-terminal-SNR schedule the trailing sequence starts at
    alpha_bar = 0; the v-prediction x0 path must stay finite and land on mu."""
    zsched = sched_lib.make_schedule(
        sched_lib.DDPMConfig(noise_steps=100, zero_terminal_snr=True)
    )
    assert float(zsched.alphas_cumprod[-1]) == 0.0
    mu = -0.3
    model = DeltaVPModel(zsched, mu)
    fn = jax.jit(
        make_sample_fn(
            model, zsched, 10, sampler=sampler, guidance_scale=1.0,
            prediction_type="v_prediction", timestep_spacing="trailing",
        )
    )
    x_T = jax.random.normal(KEY, (2, 4, 4, 3))
    out = np.asarray(fn(None, x_T, jnp.zeros((2, 77, 8)), None, KEY))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, mu, atol=5e-3)


def test_zero_snr_guards():
    zsched = sched_lib.make_schedule(
        sched_lib.DDPMConfig(noise_steps=100, zero_terminal_snr=True)
    )
    with pytest.raises(ValueError, match="sigma"):
        make_sample_fn(None, zsched, 10, sampler="euler")
    with pytest.raises(ValueError, match="v_prediction"):
        make_sample_fn(
            None, zsched, 10, sampler="ddim", timestep_spacing="trailing",
            prediction_type="epsilon",
        )
    with pytest.raises(ValueError, match="timestep_spacing"):
        make_sample_fn(None, zsched, 10, sampler="ddim", timestep_spacing="bogus")


def test_trailing_spacing_regular_schedule_converges(sched):
    """Trailing spacing is also valid on ordinary schedules (all samplers)."""
    mu = 0.25
    model = DeltaUNet(sched, mu)
    for sampler in ["ddim", "euler"]:
        fn = jax.jit(
            make_sample_fn(
                model, sched, 10, sampler=sampler, guidance_scale=1.0,
                timestep_spacing="trailing",
            )
        )
        x_T = jax.random.normal(KEY, (2, 4, 4, 3))
        out = np.asarray(fn(None, x_T, jnp.zeros((2, 77, 8)), None, KEY))
        np.testing.assert_allclose(out, mu, atol=5e-3)


def test_guidance_rescale_matches_cond_std():
    from stable_diffusion_pytorch_tpu.models.latent_diffusion import rescale_cfg

    k1, k2 = jax.random.split(KEY)
    cond = jax.random.normal(k1, (3, 8, 8, 4))
    combined = 7.5 * jax.random.normal(k2, (3, 8, 8, 4)) + 0.4
    # phi=1: per-sample std equals the conditional std exactly
    out = rescale_cfg(combined, cond, 1.0)
    s_out = np.asarray(jnp.std(out, axis=(1, 2, 3)))
    s_cond = np.asarray(jnp.std(cond, axis=(1, 2, 3)))
    np.testing.assert_allclose(s_out, s_cond, rtol=1e-4)
    # phi=0: identity
    np.testing.assert_allclose(
        np.asarray(rescale_cfg(combined, cond, 0.0)), np.asarray(combined), atol=1e-6
    )
    # phi=0.5: std strictly between
    mid = np.asarray(jnp.std(rescale_cfg(combined, cond, 0.5), axis=(1, 2, 3)))
    s_comb = np.asarray(jnp.std(combined, axis=(1, 2, 3)))
    assert ((mid > s_cond) & (mid < s_comb)).all()
