"""HF datasets path exercised in anger (diffusiondb stand-in).

The real diffusiondb cannot be fetched offline (no egress), so a local
imagefolder dataset with the same column shape (``image`` PIL + ``text``
caption — exactly what prepare_dataset.py:217-220 autodetects) drives the REAL
``datasets.load_dataset`` code path end-to-end: loading, column autodetection,
the reference's manual windowing semantics (prepare_dataset.py:174-215),
transforms, tokenization, batching.
"""

import os

import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.models.bpe import CLIPBPETokenizer
from stable_diffusion_pytorch_tpu.utils.data import (
    DataLoader,
    DatasetConfig,
    HFImageTextDataset,
    get_dataset,
)

datasets = pytest.importorskip("datasets")

N_ROWS = 8


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("fake_ddb")
    d = root / "train"
    d.mkdir()
    rows = []
    for i in range(N_ROWS):
        img = Image.fromarray(
            (np.random.default_rng(i).random((24, 32, 3)) * 255).astype(np.uint8)
        )
        img.save(d / f"img_{i}.png")
        rows.append(f"img_{i}.png,a synthetic prompt {i}")
    (d / "metadata.csv").write_text("file_name,text\n" + "\n".join(rows) + "\n")
    return str(root)


def _cfg(hf_dir, tmp_path, **kw):
    defaults = dict(
        dataset=hf_dir,
        data_dir=str(tmp_path / "cache"),
        resolution=16,
        max_train_samples=5,
        max_val_samples=2,
        max_test_samples=1,
    )
    defaults.update(kw)
    return DatasetConfig(**defaults)


def test_windowing_semantics(hf_dir, tmp_path):
    """Reference windowing: train [0,5), val [5,7), and the quirk that a window
    is only applied when it fits ENTIRELY inside the dataset — test would be
    [7,8) but 5+2+1 == 8 is not < 8, so the full dataset is returned
    (prepare_dataset.py:181-215)."""
    tok = CLIPBPETokenizer()
    cfg = _cfg(hf_dir, tmp_path)
    train = get_dataset(cfg, "train", tokenizer=tok)
    val = get_dataset(cfg, "validation", tokenizer=tok)
    test = get_dataset(cfg, "test", tokenizer=tok)
    assert isinstance(train, HFImageTextDataset)
    assert not train.synthetic_fallback
    assert len(train) == 5
    assert len(val) == 2
    assert len(test) == N_ROWS  # the reference quirk
    assert train.image_column == "image" and train.caption_column == "text"
    # windows are disjoint: val rows are train-indices 5 and 6
    assert val[0]["text"] == "a synthetic prompt 5"
    assert val[1]["text"] == "a synthetic prompt 6"


def test_rows_transform_and_batch(hf_dir, tmp_path):
    tok = CLIPBPETokenizer()
    cfg = _cfg(hf_dir, tmp_path)
    train = get_dataset(cfg, "train", tokenizer=tok)
    row = train[0]
    assert row["pixel_values"].shape == (16, 16, 3)
    assert -1.0 <= row["pixel_values"].min() and row["pixel_values"].max() <= 1.0
    assert row["input_ids"].shape == (77,)

    dl = DataLoader(train, batch_size=2, shuffle=True, seed=3)
    dl.set_epoch(0)
    batch = next(iter(dl))
    assert batch["pixel_values"].shape == (2, 16, 16, 3)
    assert batch["input_ids"].shape == (2, 77)


def test_device_preprocess_rows_are_uint8(hf_dir, tmp_path):
    tok = CLIPBPETokenizer()
    cfg = _cfg(hf_dir, tmp_path, device_preprocess=True)
    train = get_dataset(cfg, "train", tokenizer=tok)
    row = train[0]
    assert row["raw_image"].dtype == np.uint8
    assert row["raw_image"].shape == (16, 16, 3)


def test_epoch_varies_augmentation(hf_dir, tmp_path):
    tok = CLIPBPETokenizer()
    cfg = _cfg(hf_dir, tmp_path, random_flip=True, center_crop=False)
    train = get_dataset(cfg, "train", tokenizer=tok)
    train.set_epoch(0)
    a = train[0]["pixel_values"]
    train.set_epoch(0)
    a2 = train[0]["pixel_values"]
    np.testing.assert_array_equal(a, a2)  # same epoch: deterministic
    diffs = []
    for epoch in range(1, 6):
        train.set_epoch(epoch)
        diffs.append(not np.array_equal(a, train[0]["pixel_values"]))
    assert any(diffs), "augmentation never varied across epochs"
