"""Schedule golden tests: tables and steps vs the torch reference implementation.

The reference scheduler (/root/reference/stable_diffusion/models/scheduler.py) is
importable (torch-cpu only); we check our jnp tables and q/p steps against it
numerically. These tests skip gracefully if the reference tree is absent.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.models import schedule as S
from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule

REFERENCE_PATH = "/root/reference"


def _reference_scheduler():
    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)  # append: never shadow repo-root modules
    try:
        from stable_diffusion.models.scheduler import DDPMScheduler

        return DDPMScheduler(DDPMConfig())
    except Exception:
        return None


@pytest.fixture(scope="module")
def sched():
    return make_schedule(DDPMConfig())


@pytest.fixture(scope="module")
def ref():
    r = _reference_scheduler()
    if r is None:
        pytest.skip("torch reference not importable")
    return r


def test_tables_match_reference(sched, ref):
    for ours, theirs in [
        (sched.betas, ref.betas),
        (sched.alphas_cumprod, ref.alphas_cumprod),
        (sched.sqrt_alpha_bar, ref.sqrt_alpha_bar),
        (sched.sqrt_1m_alpha_bar, ref.sqrt_1m_alpha_bar),
        (sched.sqrt_recip_alpha_bar, ref.sqrt_recip_alpha_bar),
        (sched.sqrt_recip_m1_alpha_bar, ref.sqrt_recip_m1_alpha_bar),
        (sched.log_var, ref.log_var),
        (sched.mean_x0_coef, ref.mean_x0_coef),
        (sched.mean_xt_coef, ref.mean_xt_coef),
    ]:
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=2e-4, atol=1e-4
        )


def test_add_noise_matches_reference(sched, ref):
    import torch

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    noise = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    ts = np.array([0, 10, 500, 999], dtype=np.int64)

    ours = S.add_noise(sched, jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(ts))
    theirs = ref.add_noise(
        torch.from_numpy(x0), torch.from_numpy(noise), torch.from_numpy(ts)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6)


def test_ddpm_step_mean_matches_reference(sched, ref):
    """Compare the deterministic part (scale_factor=0 kills the noise term)."""
    import torch

    rng = np.random.default_rng(1)
    x_t = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    eps = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    for t in [999, 500, 1]:
        ours_x, ours_x0 = S.ddpm_step(
            sched,
            jnp.asarray(eps),
            jnp.asarray(x_t),
            jnp.asarray(t),
            jax.random.PRNGKey(0),
            scale_factor=0.0,
        )
        theirs_x, theirs_x0 = ref.step(
            torch.from_numpy(eps), torch.from_numpy(x_t), t, scale_factor=0.0
        )
        np.testing.assert_allclose(
            np.asarray(ours_x), theirs_x.numpy(), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours_x0), theirs_x0.numpy(), rtol=2e-4, atol=2e-5
        )


def test_ddpm_step_t0_adds_no_noise(sched):
    x_t = jnp.ones((2, 4, 4, 4))
    eps = jnp.zeros_like(x_t)
    x_a, _ = S.ddpm_step(sched, eps, x_t, jnp.asarray(0), jax.random.PRNGKey(0))
    x_b, _ = S.ddpm_step(sched, eps, x_t, jnp.asarray(0), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b))


def test_ddim_deterministic_and_terminal(sched):
    rng = np.random.default_rng(2)
    x_t = jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32))
    # eta=0: no key needed, deterministic
    x1, x0 = S.ddim_step(sched, eps, x_t, jnp.asarray(500), jnp.asarray(480))
    x2, _ = S.ddim_step(sched, eps, x_t, jnp.asarray(500), jnp.asarray(480))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))
    # final step (t_prev = -1): abar_prev = 1 so x_prev == pred x0
    x_final, x0_final = S.ddim_step(sched, eps, x_t, jnp.asarray(20), jnp.asarray(-1))
    np.testing.assert_allclose(
        np.asarray(x_final), np.asarray(x0_final), rtol=1e-5, atol=1e-6
    )


def test_ddim_full_chain_recovers_x0():
    """With a perfect eps oracle, DDIM must recover x0 exactly."""
    cfg = DDPMConfig(noise_steps=100)
    sched = make_schedule(cfg)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    ts = S.spaced_timesteps(100, 10)
    x = S.add_noise(sched, x0, noise, jnp.full((1,), ts[0]))
    for i in range(len(ts)):
        t = ts[i]
        t_prev = ts[i + 1] if i + 1 < len(ts) else jnp.asarray(-1)
        # oracle eps for the CURRENT x: eps = (x - sqrt(abar) x0) / sqrt(1-abar)
        eps = (x - sched.sqrt_alpha_bar[t] * x0) / sched.sqrt_1m_alpha_bar[t]
        x, _ = S.ddim_step(sched, eps, x, t, t_prev)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_dpmpp_2m_oracle_recovers_x0():
    """With a perfect eps oracle the DPM++(2M) chain must land on x0."""
    cfg = DDPMConfig(noise_steps=100)
    sched = make_schedule(cfg)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    ts = S.spaced_timesteps(100, 10)
    ts_prev = jnp.concatenate([ts[1:], jnp.full((1,), -1, ts.dtype)])
    ts_last = jnp.concatenate([jnp.full((1,), 100, ts.dtype), ts[:-1]])
    x = S.add_noise(sched, x0, noise, jnp.full((1,), ts[0]))
    x0_prev = jnp.zeros_like(x)
    for i in range(len(ts)):
        t = ts[i]
        eps = (x - sched.sqrt_alpha_bar[t] * x0) / sched.sqrt_1m_alpha_bar[t]
        x, x0_prev = S.dpmpp_2m_step(
            sched, eps, x, t, ts_prev[i], x0_prev, ts_last[i]
        )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=2e-3, atol=2e-3)


def test_dpmpp_first_step_equals_ddim():
    """DPM++ degenerates to DDIM(eta=0) on the first step."""
    sched = make_schedule(DDPMConfig(noise_steps=100))
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    t, t_prev = jnp.asarray(90), jnp.asarray(80)
    x_dpm, _ = S.dpmpp_2m_step(
        sched, eps, x, t, t_prev, jnp.zeros_like(x), jnp.asarray(100)
    )
    x_ddim, _ = S.ddim_step(sched, eps, x, t, t_prev)
    np.testing.assert_allclose(np.asarray(x_dpm), np.asarray(x_ddim), rtol=2e-4, atol=2e-4)


def test_beta_schedules():
    for kind in ["linear", "cosine", "cubic"]:
        cfg = DDPMConfig(noise_schedule=kind, noise_steps=100)
        betas = S.make_betas(kind, 100, cfg.beta_start, cfg.beta_end)
        assert betas.shape == (100,)
        assert bool(jnp.all(betas > 0)) and bool(jnp.all(betas < 1))
    lin = S.make_betas("linear", 100, 1e-4, 0.02)
    np.testing.assert_allclose(float(lin[0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(lin[-1]), 0.02, rtol=1e-6)


def test_spaced_and_leading_timesteps():
    ts = S.spaced_timesteps(1000, 50)
    assert ts.shape == (50,)
    assert int(ts[0]) == 980 and int(ts[-1]) == 0
    assert bool(jnp.all(ts[:-1] > ts[1:]))
    lead = S.leading_timesteps(50)
    np.testing.assert_array_equal(np.asarray(lead), np.arange(49, -1, -1))


def test_trailing_timesteps():
    ts = S.trailing_timesteps(1000, 50)
    assert ts.shape == (50,)
    assert int(ts[0]) == 999 and int(ts[-1]) == 19
    assert bool(jnp.all(ts[:-1] > ts[1:]))
    np.testing.assert_array_equal(
        np.asarray(S.trailing_timesteps(100, 10)), np.arange(99, 8, -10)
    )


def test_zero_terminal_snr_rescale():
    """Lin et al. 2023 Alg. 1: terminal alpha_bar hits exactly 0, the first
    entry is preserved, and the forward process at t=T-1 is pure noise."""
    cfg = DDPMConfig(noise_steps=100, zero_terminal_snr=True)
    sched = make_schedule(cfg)
    ab = np.asarray(sched.alphas_cumprod)
    base = make_schedule(DDPMConfig(noise_steps=100))
    assert ab[-1] <= 1e-12, ab[-1]
    np.testing.assert_allclose(ab[0], float(base.alphas_cumprod[0]), rtol=1e-5)
    assert (np.diff(ab) < 0).all(), "alpha_bar must stay strictly decreasing"
    # q(x_{T-1} | x0) must be exactly N(0, I): add_noise returns the noise
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.full((2,), 99, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(S.add_noise(sched, x0, noise, t)), np.asarray(noise), atol=1e-6
    )
    # betas stay a valid probability-style schedule
    betas = np.asarray(sched.betas)
    assert (betas > 0).all() and (betas <= 1.0).all()
