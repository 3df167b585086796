"""DreamBooth (Ruiz et al. 2022): prior-preservation loss split, paired
dataset/collate, class-image generation, e2e CLI. No reference counterpart
(ecosystem analog: diffusers train_dreambooth.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.utils.data import (
    DatasetConfig,
    DreamBoothDataset,
    FolderPromptDataset,
    dreambooth_collate,
)


def _write_images(folder, n, size=20, seed=0):
    from PIL import Image

    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(
            (rng.random((size, size, 3)) * 255).astype(np.uint8)
        ).save(os.path.join(folder, f"img_{i}.png"))


class _FakeTok:
    def __call__(self, texts, max_length=77, padding="max_length", truncation=True):
        class Out:
            input_ids = np.full((len(texts), max_length), 7, np.int32)

        return Out()


def test_folder_prompt_dataset(tmp_path):
    _write_images(tmp_path / "inst", 3)
    cfg = DatasetConfig(resolution=16)
    ds = FolderPromptDataset(str(tmp_path / "inst"), "a photo of sks dog", cfg, _FakeTok())
    assert len(ds) == 3
    row = ds[1]
    assert row["pixel_values"].shape == (16, 16, 3)
    assert row["text"] == "a photo of sks dog"
    assert row["input_ids"].shape == (77,)
    with pytest.raises(AssertionError):
        FolderPromptDataset(str(tmp_path), "x", cfg, _FakeTok())  # no images


def test_dreambooth_dataset_and_collate(tmp_path):
    _write_images(tmp_path / "inst", 2, seed=0)
    _write_images(tmp_path / "cls", 5, seed=1)
    cfg = DatasetConfig(resolution=16)
    inst = FolderPromptDataset(str(tmp_path / "inst"), "sks dog", cfg, _FakeTok())
    cls = FolderPromptDataset(str(tmp_path / "cls"), "a dog", cfg, _FakeTok())
    ds = DreamBoothDataset(inst, cls)
    assert len(ds) == 5  # max of the two
    rows = [ds[i] for i in range(4)]
    batch = dreambooth_collate(rows)
    assert batch["pixel_values"].shape == (8, 16, 16, 3)
    assert batch["input_ids"].shape == (8, 77)
    # even rows are instance pixels, odd rows class pixels
    for i, row in enumerate(rows):
        np.testing.assert_array_equal(batch["pixel_values"][2 * i], row["pixel_values"])
        np.testing.assert_array_equal(
            batch["pixel_values"][2 * i + 1], row["class_pixel_values"]
        )
    # epoch changes the instance->class pairing
    ds.set_epoch(1)
    row_e1 = ds[0]
    assert not np.allclose(row_e1["class_pixel_values"], rows[0]["class_pixel_values"])


def test_prior_loss_weight_splits_batch():
    """loss = MSE(even rows) + w * MSE(odd rows): affine in w, and w=1 equals
    2x the plain pooled mean (same key -> identical randomness)."""
    from stable_diffusion_pytorch_tpu.models.clip import CLIPTextTransformer
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
    from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig
    from stable_diffusion_pytorch_tpu.trainers.steps import make_unet_train_step

    import optax

    key = jax.random.PRNGKey(0)
    unet = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[16, 32], n_heads=4, time_emb_dim=32, n_layers=1)
    )
    clip = CLIPTextTransformer(d_model=768, n_layers=1, n_heads=4, intermediate=64)
    lat = jax.random.normal(key, (4, 8, 8, 4))
    ids = jnp.zeros((4, 8), jnp.int32)
    unet_params = unet.init(
        key, lat[:1], jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 768))
    )
    clip_params = clip.init(key, ids[:1])
    sched = make_schedule(DDPMConfig(noise_steps=20))
    tx = optax.sgd(1e-3)
    batch = {"latents": lat, "input_ids": ids}
    uncond = jnp.zeros((8,), jnp.int32)

    def eval_loss(plw):
        _, ev = make_unet_train_step(
            unet, clip, None, sched, tx, cfg_dropout_prob=0.0,
            prior_loss_weight=plw,
        )
        return float(ev(unet_params, clip_params, None, batch, uncond, key))

    l0, l1, l2, l3 = eval_loss(0.0), eval_loss(1.0), eval_loss(2.0), eval_loss(3.0)
    np.testing.assert_allclose(l1, 2 * l0, rtol=1e-5)  # m_e + m_o = 2*mean
    np.testing.assert_allclose(l2 - l1, l3 - l2, rtol=1e-4)  # affine in w
    assert l2 > l1  # the odd-row term is positive


def test_train_dreambooth_e2e(tmp_path, monkeypatch):
    """CLI end-to-end: generates missing class images with the current model,
    trains with prior preservation, logs metrics, checkpoints."""
    monkeypatch.chdir(tmp_path)
    import train_dreambooth

    _write_images(tmp_path / "inst", 2)
    ckpt = str(tmp_path / "ckpt")
    train_dreambooth.main([
        "--instance-data-dir", str(tmp_path / "inst"),
        "--instance-prompt", "a photo of sks blob",
        "--with-prior-preservation",
        "--class-data-dir", str(tmp_path / "cls"),
        "--class-prompt", "a photo of a blob",
        "--num-class-images", "3",
        "--class-sampling-steps", "2",
        "--prior-loss-weight", "0.5",
        "--train-batch-size", "1",
        "--eval-batch-size", "1",
        "--gradient-accumulation-steps", "1",
        "--channels-list", "16,32",
        "--n-heads", "4",
        "--time-emb-dim", "32",
        "--n-layers", "1",
        "--autoencoder-channels-list", "8,16",
        "--groups", "4",
        "--resolution", "16",
        "--noise-steps", "20",
        "--num-devices", "2",
        "--max-train-steps", "3",
        "--log-interval", "2",
        "--ckpt-dir", ckpt,
        "--checkpointing-steps", "2",
        "--logging-dir", str(tmp_path / "logs"),
    ])
    # class images were generated
    cls_files = os.listdir(tmp_path / "cls")
    assert len(cls_files) == 3, cls_files
    assert os.path.isdir(os.path.join(ckpt, "checkpoint-2"))
    with open(tmp_path / "logs" / "train_unet_metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    steps = [r["step"] for r in records if "train_loss" in r]
    assert steps == [1, 2, 3]
    assert any("eval_loss" in r for r in records)
    # second invocation reuses the generated class images (no new files)
    mtimes = {f: os.path.getmtime(tmp_path / "cls" / f) for f in cls_files}
    train_dreambooth.main([
        "--instance-data-dir", str(tmp_path / "inst"),
        "--instance-prompt", "a photo of sks blob",
        "--with-prior-preservation",
        "--class-data-dir", str(tmp_path / "cls"),
        "--class-prompt", "a photo of a blob",
        "--num-class-images", "3",
        "--train-batch-size", "1",
        "--eval-batch-size", "1",
        "--gradient-accumulation-steps", "1",
        "--channels-list", "16,32",
        "--n-heads", "4",
        "--time-emb-dim", "32",
        "--n-layers", "1",
        "--autoencoder-channels-list", "8,16",
        "--groups", "4",
        "--resolution", "16",
        "--noise-steps", "20",
        "--num-devices", "2",
        "--max-train-steps", "1",
        "--log-interval", "0",
        "--ckpt-dir", str(tmp_path / "ckpt2"),
        "--logging-dir", str(tmp_path / "logs2"),
    ])
    for f, t in mtimes.items():
        assert os.path.getmtime(tmp_path / "cls" / f) == t
