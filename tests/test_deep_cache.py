"""DeepCache (Ma et al. 2023 / "Cache Me if You Can"-style block caching):
opt-in sampler acceleration reusing the UNet's deep trunk across steps.
No reference counterpart."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig

CFG = UnetConfig(channels_list=[16, 32], n_heads=4, time_emb_dim=32, n_layers=1)


@pytest.fixture(scope="module")
def tiny_unet():
    key = jax.random.PRNGKey(0)
    unet = UNetModel.from_config(4, 8, CFG)
    x = jax.random.normal(key, (2, 8, 8, 4))
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 768))
    params = unet.init(key, x, t, ctx)
    return unet, params, x, t, ctx


def test_deep_cache_path_is_exact_when_fresh(tiny_unet):
    """Full forward's trunk fed back via deep_cache reproduces the full
    forward EXACTLY — the shallow recompute is the identical computation."""
    unet, params, x, t, ctx = tiny_unet
    out_full, deep = unet.apply(params, x, t, ctx, return_deep=True)
    out_cached = unet.apply(params, x, t, ctx, deep_cache=deep)
    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_cached))
    assert deep.shape == (2, 8, 8, 32)  # channels_list[1] at full latent res


def test_deep_cache_with_stale_trunk_differs(tiny_unet):
    unet, params, x, t, ctx = tiny_unet
    # perturb off init: zero-init out-convs make a fresh UNet t-independent
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    _, deep = unet.apply(params, x, t, ctx, return_deep=True)
    out_t7 = unet.apply(params, x, jnp.array([40, 40], jnp.int32), ctx)
    out_stale = unet.apply(
        params, x, jnp.array([40, 40], jnp.int32), ctx, deep_cache=deep
    )
    # stale trunk is an approximation, not the exact t=40 output
    assert not np.allclose(np.asarray(out_stale), np.asarray(out_t7))


def test_sampling_with_deep_cache(tiny_unet):
    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule

    unet, params, x, t, ctx = tiny_unet
    sched = make_schedule(DDPMConfig(noise_steps=20))
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (1, 8, 8, 4))
    c = ctx[:1]
    u = jnp.zeros_like(c)

    exact_fn = make_sample_fn(unet, sched, 8, sampler="ddim", guidance_scale=7.5)
    dc_fn = make_sample_fn(
        unet, sched, 8, sampler="ddim", guidance_scale=7.5, deep_cache_interval=2
    )
    exact = np.asarray(jax.jit(exact_fn)(params, noise, c, u, key))
    dc = np.asarray(jax.jit(dc_fn)(params, noise, c, u, key))
    dc2 = np.asarray(jax.jit(dc_fn)(params, noise, c, u, key))
    assert np.isfinite(dc).all()
    np.testing.assert_array_equal(dc, dc2)  # deterministic
    assert not np.array_equal(dc, exact)  # approximation
    # the approximation stays in the same regime as the exact result
    assert np.abs(dc - exact).mean() < 5 * np.abs(exact).std()


def test_deep_cache_validation():
    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule

    unet = UNetModel.from_config(4, 8, CFG)
    sched = make_schedule(DDPMConfig(noise_steps=20))
    with pytest.raises(ValueError, match="discrete"):
        make_sample_fn(unet, sched, 8, sampler="euler", deep_cache_interval=2)
    single = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[16], n_heads=4, time_emb_dim=32, n_layers=1)
    )
    with pytest.raises(ValueError, match="2-level"):
        make_sample_fn(single, sched, 8, sampler="ddim", deep_cache_interval=2)


def test_txt2img_cli_with_deep_cache(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from scripts import txt2img

    txt2img.main([
        "--channels-list", "16,32",
        "--n-heads", "4",
        "--time-emb-dim", "32",
        "--n-layers", "1",
        "--autoencoder-channels-list", "8,16",
        "--groups", "4",
        "--noise-steps", "20",
        "--image-size", "16",
        "--sampling-steps", "6",
        "--deep-cache-interval", "3",
        "--prompt", "a red circle",
        "--output-dir", str(tmp_path / "out"),
        "--output-name", "dc",
    ])
    import os

    assert any("dc" in f for f in os.listdir(tmp_path / "out"))
