"""End-to-end txt2img pipeline tests (CPU-runnable, tiny model)."""

import os

import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config
from stable_diffusion_pytorch_tpu.models.build import build_models
from stable_diffusion_pytorch_tpu.pipeline import SamplingConfig, sample

TINY_ARGS = [
    "--channels-list", "32,64", "--n-heads", "4", "--time-emb-dim", "64",
    "--n-layers", "1", "--autoencoder-channels-list", "16,32", "--groups", "8",
    "--noise-steps", "50",
]


@pytest.fixture(scope="module")
def tiny_model():
    _, cfg = load_config(TINY_ARGS)
    return build_models(cfg.model, init_image_size=32), cfg


def test_txt2img_end_to_end(tiny_model, tmp_path):
    model, _ = tiny_model
    outs = sample(
        model,
        image_size=32,
        prompt="a red circle",
        time_steps=4,
        guidance_scale=7.5,
        save_dir=str(tmp_path),
        sampler="ddim",
        seed=0,
    )
    assert len(outs) == 1
    img = outs[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert os.path.exists(tmp_path / "txt2img.png")


def test_txt2img_batched_ddpm(tiny_model, tmp_path):
    model, _ = tiny_model
    outs = sample(
        model,
        image_size=32,
        prompt="a blue square",
        time_steps=3,
        guidance_scale=1.0,   # no CFG path
        sampler="ddpm",
        num_images=2,
        save_dir=str(tmp_path),
        seed=1,
    )
    assert len(outs) == 2
    assert os.path.exists(tmp_path / "txt2img_0.png")
    assert os.path.exists(tmp_path / "txt2img_1.png")


def test_txt2img_reference_compat_mode(tmp_path):
    _, cfg = load_config(TINY_ARGS + ["--reference-compat"])
    compat = compat_from_cfg(cfg)
    assert compat.uniform_init_noise and compat.ascending_sample_loop
    model = build_models(cfg.model, compat=compat, init_image_size=32)
    outs = sample(
        model, image_size=32, prompt="x", time_steps=3, guidance_scale=7.5,
        save_dir=str(tmp_path), sampler="ddpm", seed=2,
    )
    assert outs[0].shape == (32, 32, 3)


def test_sampling_config_group():
    _, cfg = load_config(
        TINY_ARGS + ["--prompt", "hello", "--sampling-steps", "7", "--sampler", "ddpm"],
        extra_data_classes=[SamplingConfig],
    )
    assert cfg.sampling.prompt == "hello"
    assert cfg.sampling.sampling_steps == 7
    assert cfg.sampling.sampler == "ddpm"


def test_clip_text_encoder_properties(tiny_model):
    """Causality + determinism of the Flax CLIP tower."""
    import jax.numpy as jnp

    model, _ = tiny_model
    te = model.text_encoder
    ids = te.tokenize(["a cat", "a dog on a mat"]).input_ids
    assert ids.shape == (2, 77)
    emb = te.encode_text(ids)
    assert emb.shape == (2, 77, 768)
    # causal: changing token at position 10 must not affect positions < 10
    ids2 = np.array(ids)
    ids2[0, 10] = 123
    emb2 = te.encode_text(ids2)
    np.testing.assert_allclose(
        np.asarray(emb[0, :10]), np.asarray(emb2[0, :10]), atol=1e-5
    )
    assert not np.allclose(np.asarray(emb[0, 10:]), np.asarray(emb2[0, 10:]))


def test_hires_fix_two_stage(tmp_path, monkeypatch):
    """hires fix: final image is at image_size * hires_scale, runs through the
    real txt2img CLI."""
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
        "--sampling-steps", "4",
        "--hires-scale", "2",
        "--hires-strength", "0.5",
        "--prompt", "a red circle",
        "--output-dir", str(tmp_path / "out"),
        "--output-name", "hires",
    ])
    import os

    from PIL import Image

    files = [f for f in os.listdir(tmp_path / "out") if "hires" in f]
    assert files
    img = Image.open(tmp_path / "out" / files[0])
    assert img.size == (32, 32)  # 16 x 2
