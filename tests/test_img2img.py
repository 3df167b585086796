"""img2img / inpainting pipeline tests (capabilities beyond the reference)."""

import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.config import load_config
from stable_diffusion_pytorch_tpu.models.build import build_models
from stable_diffusion_pytorch_tpu.pipeline import img2img, inpaint

TINY_ARGS = [
    "--channels-list", "32,64", "--n-heads", "4", "--time-emb-dim", "64",
    "--n-layers", "1", "--autoencoder-channels-list", "16,32", "--groups", "8",
    "--noise-steps", "50",
]


@pytest.fixture(scope="module")
def tiny_model():
    _, cfg = load_config(TINY_ARGS)
    return build_models(cfg.model, init_image_size=32)


def test_strength_truncates_schedule():
    import jax.numpy as jnp

    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
    from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig

    unet = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[32, 64], n_heads=4, time_emb_dim=64, n_layers=1)
    )
    sched = make_schedule(DDPMConfig(noise_steps=100))
    fn_full = make_sample_fn(unet, sched, 10, strength=1.0)
    fn_half = make_sample_fn(unet, sched, 10, strength=0.5)
    assert fn_full.start_timestep == 90
    # half strength keeps the LAST 5 steps: [40, 30, 20, 10, 0]
    assert fn_half.start_timestep == 40


def test_img2img_roundtrip(tiny_model, tmp_path):
    rng = np.random.default_rng(0)
    init = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = img2img(
        tiny_model, init, prompt="x", strength=0.5, image_size=32,
        time_steps=4, guidance_scale=1.0, save_dir=str(tmp_path), seed=0,
    )
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    assert (tmp_path / "img2img.png").exists()


def test_inpaint_preserves_unmasked_region(tiny_model, tmp_path):
    """With a zero-init UNet the sampler is ~identity-ish; the unmasked region
    must come back close to the init image's VAE roundtrip while the masked
    region is free. We check the blend machinery: mask=0 everywhere -> output ==
    plain VAE roundtrip of the init image."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    init = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    zero_mask = np.zeros((32, 32), np.uint8)
    out = inpaint(
        tiny_model, init, zero_mask, prompt="x", image_size=32,
        time_steps=3, guidance_scale=1.0, save_dir=str(tmp_path), seed=1,
    )
    # reference: encode -> sample(seeded like the pipeline) -> decode
    from stable_diffusion_pytorch_tpu.pipeline import _load_image
    from stable_diffusion_pytorch_tpu.utils.data import detransform

    key = jax.random.PRNGKey(1)
    k_enc, _, _ = jax.random.split(key, 3)
    img = jnp.asarray(_load_image(init, 32))
    lat = tiny_model.encode_image(img).latent_dist.sample(k_enc)
    expect = detransform(np.asarray(tiny_model.decode_latent(lat))[0])
    np.testing.assert_allclose(
        out.astype(np.int32), expect.astype(np.int32), atol=2
    )
    assert (tmp_path / "inpaint.png").exists()


# --------------------------------------------------------------------------- #
# sampler x mode matrix: every CLI-legal {sigma-space sampler} x {img2img,
# inpaint} combination executes (VERDICT r2 weak #7; CLI surface
# pipeline.py:265-405)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("sampler", ["euler_a", "heun", "dpmpp_sde"])
def test_img2img_sampler_matrix(tiny_model, sampler, tmp_path):
    rng = np.random.default_rng(2)
    init = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = img2img(
        tiny_model, init, prompt="x", strength=0.6, image_size=32,
        time_steps=4, guidance_scale=1.0, sampler=sampler,
        save_dir=str(tmp_path), seed=3, name=f"i2i_{sampler}",
    )
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()


@pytest.mark.parametrize("sampler", ["euler_a", "heun", "dpmpp_sde"])
def test_inpaint_sampler_matrix(tiny_model, sampler, tmp_path):
    rng = np.random.default_rng(3)
    init = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 8:24] = 255  # repaint the center
    out = inpaint(
        tiny_model, init, mask, prompt="x", image_size=32,
        time_steps=4, guidance_scale=1.0, sampler=sampler,
        save_dir=str(tmp_path), seed=4, name=f"inp_{sampler}",
    )
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()


def test_img2img_ddim_eta_stochastic():
    """eta>0 DDIM under strength<1: runs and differs across seeds' noise."""
    rng = np.random.default_rng(4)
    init = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    _, cfg = load_config(TINY_ARGS)
    model = build_models(cfg.model, init_image_size=32)
    a = img2img(
        model, init, prompt="x", strength=0.6, image_size=32, time_steps=4,
        guidance_scale=1.0, sampler="ddim", eta=1.0, save_dir=None, seed=5,
    )
    b = img2img(
        model, init, prompt="x", strength=0.6, image_size=32, time_steps=4,
        guidance_scale=1.0, sampler="ddim", eta=1.0, save_dir=None, seed=6,
    )
    assert a.shape == b.shape == (32, 32, 3)
    assert not np.array_equal(a, b), "eta=1 DDIM must inject per-seed noise"
