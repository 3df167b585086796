"""Data pipeline: dataset loading, transforms, batching, image IO.

Counterpart of /root/reference/utils/prepare_dataset.py. Differences by design:

- NHWC float32 tensors in [-1, 1] (TPU layout) instead of NCHW torch tensors.
- The manual train/validation/test windowing over the single "train" split keeps
  the reference's exact semantics (prepare_dataset.py:174-215): train = rows
  [0, max_train), validation = [max_train, max_train+max_val), test = the next
  max_test rows — including the quirk that the window is only applied when it
  fits entirely inside the dataset.
- Offline-first: ``--dataset synthetic`` (or any load failure in a no-egress
  environment) yields a deterministic procedural dataset so training/eval/bench
  run anywhere; the HF ``datasets`` path (diffusiondb etc.) is used when
  available locally.
- Batches are fixed-shape (drop_last) so every train step hits the same XLA
  program.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Sequence

import numpy as np

from stable_diffusion_pytorch_tpu.config import BaseConfig


@dataclass
class DatasetConfig(BaseConfig):
    """Flag surface mirrors /root/reference/utils/prepare_dataset.py:26-61."""

    dataset: str = field(
        default="poloclub/diffusiondb",
        metadata={"help": "name of the dataset to use. Use 'synthetic' for the offline procedural dataset."},
    )
    subset: Optional[str] = field(
        default=None,
        metadata={"help": "subset of the dataset to use."},
    )
    data_dir: str = field(
        default="data/dataset",
        metadata={"help": "Cache directory to store loaded dataset."},
    )
    dataloader_num_workers: int = field(
        default=4,
        metadata={
            "help": "number of workers for the dataloaders. >0 decodes rows "
            "on a thread pool: the dataset's __getitem__ must be thread-safe "
            "(the built-in HF/synthetic/latent-cache datasets are; pass 0 to "
            "serialize access for custom datasets that share file handles or "
            "decoders across calls)."
        },
    )
    resolution: int = field(default=64, metadata={"help": "resolution of the images."})
    center_crop: bool = field(
        default=True, metadata={"help": "whether to apply center cropping."}
    )
    random_flip: bool = field(
        default=False, metadata={"help": "whether to apply random flipping."}
    )
    max_train_samples: Optional[int] = field(
        default=9000, metadata={"help": "max number of training samples to load."}
    )
    max_val_samples: Optional[int] = field(
        default=500, metadata={"help": "max number of validation samples to load."}
    )
    max_test_samples: Optional[int] = field(
        default=500, metadata={"help": "max number of test samples to load."}
    )
    latent_cache: Optional[str] = field(
        default=None,
        metadata={
            "help": "Path to a VAE-latent cache (.npz). train_unet builds it on "
            "first use and then trains from cached latents instead of pixels."
        },
    )
    device_preprocess: bool = field(
        default=False,
        metadata={
            "help": "Ship raw uint8 images to the accelerator and run "
            "normalize/flip inside the jitted train step (4x less host->device "
            "bandwidth; pod-scale input path)."
        },
    )


# --------------------------------------------------------------------------- #
# transforms (host-side; the pod-scale on-device path lives in utils/preprocess)
# --------------------------------------------------------------------------- #


def resize_image(img: np.ndarray, resolution: int) -> np.ndarray:
    """Bilinear resize so the SHORT side == resolution (torchvision Resize semantics,
    prepare_dataset.py:130-132). img: [H, W, C] uint8/float."""
    from PIL import Image

    h, w = img.shape[:2]
    if h < w:
        new_h, new_w = resolution, max(resolution, round(w * resolution / h))
    else:
        new_h, new_w = max(resolution, round(h * resolution / w)), resolution
    pil = Image.fromarray(img.astype(np.uint8))
    return np.asarray(pil.resize((new_w, new_h), Image.BILINEAR))


def center_crop_image(img: np.ndarray, resolution: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = (h - resolution) // 2
    left = (w - resolution) // 2
    return img[top : top + resolution, left : left + resolution]


def random_crop_image(
    img: np.ndarray, resolution: int, rng: np.random.Generator
) -> np.ndarray:
    h, w = img.shape[:2]
    top = int(rng.integers(0, h - resolution + 1))
    left = int(rng.integers(0, w - resolution + 1))
    return img[top : top + resolution, left : left + resolution]


def transform_image(
    img: np.ndarray,
    resolution: int,
    center_crop: bool = True,
    random_flip: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Resize -> crop -> (flip) -> [-1, 1] float32 NHWC (prepare_dataset.py:127-142)."""
    rng = rng or np.random.default_rng(0)
    img = resize_image(img, resolution)
    img = (
        center_crop_image(img, resolution)
        if center_crop
        else random_crop_image(img, resolution, rng)
    )
    if random_flip and rng.random() < 0.5:
        img = img[:, ::-1]
    img = img.astype(np.float32) / 255.0
    return (img - 0.5) / 0.5


def detransform(latent) -> np.ndarray:
    """[B?, h, w, c] in [-1,1] -> HWC uint8 (prepare_dataset.py:145-150).

    Accepts jnp or np arrays, NHWC; squeezes a leading batch dim of 1."""
    arr = np.asarray(latent, dtype=np.float32)
    if arr.ndim == 4 and arr.shape[0] == 1:
        arr = arr[0]
    arr = (arr + 1.0) / 2.0
    arr = np.clip(arr, 0.0, 1.0)
    return (arr * 255.0).astype(np.uint8)


def to_img(digit_img: np.ndarray, output_path: str = "", name: str = "sample"):
    """Save HWC uint8 to {output_path}/{name}.png (prepare_dataset.py:153-156)."""
    from PIL import Image

    if output_path:
        os.makedirs(output_path, exist_ok=True)
    img = Image.fromarray(digit_img.astype(np.uint8))
    img.save(os.path.join(output_path, f"{name}.png"))
    return img


def tokenize_captions(
    captions: Sequence, tokenizer, is_train: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """prepare_dataset.py:105-124: random caption choice for multi-caption rows.

    ``rng`` should come from the caller (seeded per row AND per epoch) so
    multi-caption rows see different captions across epochs, like the
    reference's global-RNG re-randomization on every access."""
    rng = rng if rng is not None else np.random.default_rng(0)
    chosen: List[str] = []
    for caption in captions:
        if isinstance(caption, str):
            chosen.append(caption)
        elif isinstance(caption, (list, np.ndarray)):
            chosen.append(
                caption[int(rng.integers(len(caption)))] if is_train else caption[0]
            )
        else:
            raise ValueError(
                "Caption column should contain either strings or lists of strings."
            )
    out = tokenizer(
        chosen,
        max_length=getattr(tokenizer, "model_max_length", 77),
        padding="max_length",
        truncation=True,
    )
    return np.asarray(out.input_ids, dtype=np.int32)


def collate_fn(examples: Sequence[dict]) -> dict:
    """Stack examples into fixed-shape arrays (prepare_dataset.py:98-102).

    Rows carrying ``raw_image`` (uint8, device-preprocess mode) stack to
    ``raw_images``; normalization happens on-device inside the train step."""
    input_ids = np.stack([e["input_ids"] for e in examples]).astype(np.int32)
    if "raw_image" in examples[0]:
        raw = np.stack([e["raw_image"] for e in examples])
        out = {"raw_images": raw, "input_ids": input_ids}
    else:
        pixel_values = np.stack(
            [e["pixel_values"] for e in examples]
        ).astype(np.float32)
        out = {"pixel_values": pixel_values, "input_ids": input_ids}
    if "hint" in examples[0]:  # ControlNet conditioning rides along
        out["hint"] = np.stack([e["hint"] for e in examples]).astype(np.float32)
    return out


# --------------------------------------------------------------------------- #
# datasets
# --------------------------------------------------------------------------- #


class SyntheticTextImageDataset:
    """Deterministic procedural text-image dataset for offline runs.

    Each row is a colored-gradient-and-shapes image with a matching caption;
    rows are a pure function of their index so train/eval are reproducible
    across hosts (important for per-host data sharding).
    """

    _COLORS = [
        ("red", (220, 60, 50)),
        ("green", (70, 180, 90)),
        ("blue", (60, 90, 210)),
        ("yellow", (230, 200, 60)),
        ("purple", (150, 70, 190)),
        ("orange", (240, 140, 40)),
    ]
    _SHAPES = ["circle", "square", "stripes"]

    def __init__(self, cfg: DatasetConfig, split: str, tokenizer, num_rows: int):
        self.cfg = cfg
        self.split = split
        self.tokenizer = tokenizer
        self.num_rows = num_rows
        self.resolution = cfg.resolution
        self.epoch = 0
        self.synthetic_fallback = False  # True when substituting a real dataset

    def set_epoch(self, epoch: int) -> None:
        """Vary augmentation randomness across epochs (DataLoader forwards this)."""
        self.epoch = epoch

    def _row_rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng(np.random.SeedSequence([self.epoch, idx]))

    def __len__(self) -> int:
        return self.num_rows

    def _render(self, idx: int) -> np.ndarray:
        res = self.resolution
        rng = np.random.default_rng(idx + {"train": 0, "validation": 10**6, "test": 2 * 10**6}[self.split])
        color_i = idx % len(self._COLORS)
        shape = self._SHAPES[(idx // len(self._COLORS)) % len(self._SHAPES)]
        _, rgb = self._COLORS[color_i]
        yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
        base = np.stack([yy * c / 255.0 for c in rgb], axis=-1)
        img = base * 0.6 + 0.2
        cx, cy = rng.uniform(0.3, 0.7, size=2)
        r = rng.uniform(0.15, 0.3)
        if shape == "circle":
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
        elif shape == "square":
            mask = (np.abs(yy - cy) < r) & (np.abs(xx - cx) < r)
        else:
            freq = rng.uniform(12, 28)
            phase = rng.uniform(0, 2 * np.pi)
            mask = (np.sin(xx * freq + phase) > 0.3) & (yy > 0.2) & (yy < 0.8)
        img[mask] = np.array(rgb, np.float32) / 255.0
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    def __getitem__(self, idx: int) -> dict:
        color_name = self._COLORS[idx % len(self._COLORS)][0]
        shape = self._SHAPES[(idx // len(self._COLORS)) % len(self._SHAPES)]
        caption = f"a {color_name} {shape} on a gradient background"
        img = self._render(idx)
        input_ids = tokenize_captions([caption], self.tokenizer)[0]
        if getattr(self.cfg, "device_preprocess", False):
            # ship uint8; normalize/flip happen on-device in the train step
            return {"raw_image": img, "input_ids": input_ids, "text": caption}
        pixel_values = transform_image(
            img,
            self.cfg.resolution,
            center_crop=self.cfg.center_crop,
            random_flip=self.cfg.random_flip,
            rng=self._row_rng(idx),
        )
        return {
            "pixel_values": pixel_values,
            "input_ids": input_ids,
            "text": caption,
        }


class HFImageTextDataset:
    """Lazy-transform view over an HF dataset split (prepare_dataset.py:159-236)."""

    def __init__(self, hf_dataset, cfg: DatasetConfig, tokenizer, is_train: bool):
        self.ds = hf_dataset
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.is_train = is_train
        self.epoch = 0
        self.synthetic_fallback = False
        cols = hf_dataset.column_names
        self.image_column = [c for c in ["image", "img"] if c in cols][0]
        self.caption_column = [c for c in ["text", "caption", "prompt"] if c in cols][0]

    def set_epoch(self, epoch: int) -> None:
        """Vary augmentation/caption randomness across epochs."""
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.ds)

    def __getitem__(self, idx: int) -> dict:
        row = self.ds[int(idx)]
        img = np.asarray(row[self.image_column].convert("RGB"))
        caption = row[self.caption_column]
        rng = np.random.default_rng(np.random.SeedSequence([self.epoch, idx]))
        input_ids = tokenize_captions(
            [caption], self.tokenizer, self.is_train, rng=rng
        )[0]
        text = caption if isinstance(caption, str) else caption[0]
        if getattr(self.cfg, "device_preprocess", False):
            # host only decodes + fixes the shape (resize short side, center
            # crop, uint8); normalize/flip run on-device in the train step
            raw = center_crop_image(
                resize_image(img, self.cfg.resolution), self.cfg.resolution
            )
            return {"raw_image": raw.astype(np.uint8), "input_ids": input_ids, "text": text}
        pixel_values = transform_image(
            img,
            self.cfg.resolution,
            center_crop=self.cfg.center_crop,
            random_flip=self.cfg.random_flip and self.is_train,
            rng=rng,
        )
        return {
            "pixel_values": pixel_values,
            "input_ids": input_ids,
            "text": text,
        }


# Prompt templates from the textual-inversion paper (Gal et al. 2022,
# "imagenet_templates_small"); no reference counterpart — capability beyond
# /root/reference (the ecosystem analog is diffusers textual_inversion.py).
TI_TEMPLATES = [
    "a photo of a {}",
    "a rendering of a {}",
    "the photo of a {}",
    "a photo of a clean {}",
    "a photo of a dirty {}",
    "a dark photo of the {}",
    "a photo of my {}",
    "a photo of the cool {}",
    "a close-up photo of a {}",
    "a bright photo of the {}",
    "a cropped photo of a {}",
    "a photo of the {}",
    "a good photo of the {}",
    "a photo of one {}",
    "a rendition of the {}",
    "a photo of a nice {}",
    "a photo of a small {}",
]


class TextualInversionDataset:
    """Wrap any image dataset: keep its pixels, replace every caption with a
    TI template rendered with the placeholder token ("a photo of a <concept>").

    ``tokenize`` must be the TI-aware ``CLIPModel.tokenize`` bound method (it
    expands the placeholder into the learned sentinel ids); the base dataset's
    own captions/input_ids are discarded. Template choice varies per row and
    per epoch like the base augmentation randomness."""

    def __init__(self, base, placeholder_token: str, tokenize):
        self.base = base
        self.placeholder_token = placeholder_token
        self.tokenize = tokenize
        self.epoch = 0
        self.synthetic_fallback = bool(getattr(base, "synthetic_fallback", False))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.base, "set_epoch"):
            self.base.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> dict:
        row = dict(self.base[int(idx)])
        rng = np.random.default_rng(np.random.SeedSequence([self.epoch, idx, 7]))
        text = TI_TEMPLATES[int(rng.integers(len(TI_TEMPLATES)))].format(
            self.placeholder_token
        )
        row["text"] = text
        row["input_ids"] = np.asarray(
            self.tokenize([text]).input_ids, dtype=np.int32
        )[0]
        return row


class FolderPromptDataset:
    """Images from a local folder, every row captioned with ONE fixed prompt
    (the DreamBooth instance/class dataset shape; Ruiz et al. 2022). No
    reference counterpart — capability extension."""

    _EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")

    def __init__(self, folder: str, prompt: str, cfg: DatasetConfig, tokenizer):
        self.folder = folder
        self.prompt = prompt
        self.cfg = cfg
        self.paths = sorted(
            os.path.join(folder, f)
            for f in os.listdir(folder)
            if f.lower().endswith(self._EXTS)
        )
        assert self.paths, f"no images found under {folder!r}"
        self.input_ids = tokenize_captions([prompt], tokenizer)[0]
        self.epoch = 0
        self.synthetic_fallback = False

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        from PIL import Image

        img = np.asarray(Image.open(self.paths[int(idx)]).convert("RGB"))
        pixel_values = transform_image(
            img,
            self.cfg.resolution,
            center_crop=self.cfg.center_crop,
            random_flip=self.cfg.random_flip,
            rng=np.random.default_rng(np.random.SeedSequence([self.epoch, idx])),
        )
        return {
            "pixel_values": pixel_values,
            "input_ids": self.input_ids,
            "text": self.prompt,
        }


class DreamBoothDataset:
    """Pair every instance row with a class (prior) row. ``__getitem__``
    returns both; ``dreambooth_collate`` interleaves them (even rows instance,
    odd rows class) so the train step's prior-preservation loss can split them
    with a stride — see trainers/steps.py (prior_loss_weight)."""

    def __init__(self, instance_ds, class_ds):
        self.instance_ds = instance_ds
        self.class_ds = class_ds
        self.epoch = 0
        self.synthetic_fallback = bool(
            getattr(instance_ds, "synthetic_fallback", False)
        )

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        for ds in (self.instance_ds, self.class_ds):
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)

    def __len__(self) -> int:
        return max(len(self.instance_ds), len(self.class_ds))

    def __getitem__(self, idx: int) -> dict:
        inst = self.instance_ds[int(idx) % len(self.instance_ds)]
        # decorrelate the class pairing across epochs
        shift = int(
            np.random.default_rng(np.random.SeedSequence([self.epoch])).integers(
                1 << 30
            )
        )
        cls = self.class_ds[(int(idx) + shift) % len(self.class_ds)]
        return {
            "pixel_values": inst["pixel_values"],
            "input_ids": inst["input_ids"],
            "class_pixel_values": cls["pixel_values"],
            "class_input_ids": cls["input_ids"],
        }


def dreambooth_collate(examples: Sequence[dict]) -> dict:
    """Interleave instance (even) and class (odd) rows into one 2B batch of
    standard keys, keeping both populations on every device when the batch
    axis is sharded contiguously over the data mesh."""
    pixels = np.empty(
        (2 * len(examples),) + np.asarray(examples[0]["pixel_values"]).shape,
        np.float32,
    )
    ids = np.empty((2 * len(examples),) + np.asarray(examples[0]["input_ids"]).shape,
                   np.int32)
    for i, e in enumerate(examples):
        pixels[2 * i] = e["pixel_values"]
        pixels[2 * i + 1] = e["class_pixel_values"]
        ids[2 * i] = e["input_ids"]
        ids[2 * i + 1] = e["class_input_ids"]
    return {"pixel_values": pixels, "input_ids": ids}


def edge_hint(pixel_values: np.ndarray, threshold: float = 0.15) -> np.ndarray:
    """Default ControlNet conditioning: a Sobel-magnitude edge map of the
    target image ([-1,1] HWC in, [-1,1] 3-channel edge image out). Offline
    stand-in for Canny (no cv2 in the image); same information class —
    binary-ish edges."""
    gray = np.asarray(pixel_values, np.float32).mean(axis=-1)
    gy = np.zeros_like(gray)
    gx = np.zeros_like(gray)
    gy[1:-1, :] = gray[2:, :] - gray[:-2, :]
    gx[:, 1:-1] = gray[:, 2:] - gray[:, :-2]
    mag = np.sqrt(gx * gx + gy * gy)
    edges = (mag > threshold).astype(np.float32)
    return np.repeat((edges * 2.0 - 1.0)[..., None], 3, axis=-1)


class ControlNetDataset:
    """Wrap an image-text dataset with a conditioning hint per row:
    ``hint_fn(pixel_values) -> [H, W, C]`` in [-1,1] (default: edge map).
    The train step consumes the extra ``hint`` batch key
    (trainers/steps.py:make_controlnet_train_step)."""

    def __init__(self, base, hint_fn=None):
        self.base = base
        self.hint_fn = hint_fn or edge_hint
        self.synthetic_fallback = bool(getattr(base, "synthetic_fallback", False))

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.base, "set_epoch"):
            self.base.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> dict:
        row = dict(self.base[int(idx)])
        assert "pixel_values" in row, (
            "ControlNetDataset needs pixel rows (device_preprocess unsupported)"
        )
        row["hint"] = self.hint_fn(row["pixel_values"])
        return row


def _split_window(cfg: DatasetConfig, split: str, total: int, logger=None):
    """The reference's manual windowing rules (prepare_dataset.py:181-215)."""
    mtr, mva, mte = cfg.max_train_samples, cfg.max_val_samples, cfg.max_test_samples
    if split == "train" and mtr is not None:
        if mtr < total:
            return range(0, mtr)
        if logger:
            logger.info(f"max_train_samples({mtr}) is larger than the dataset({total})")
    if split == "validation" and mva is not None:
        if mtr + mva < total:
            return range(mtr, mtr + mva)
        if logger:
            logger.info(f"max_val_samples({mva}) is larger than the dataset({total})")
    if split == "test" and mte is not None:
        if mtr + mva + mte < total:
            return range(mtr + mva, mtr + mva + mte)
        if logger:
            logger.info(f"max_test_samples({mte}) is larger than the dataset({total})")
    return range(total)


def get_dataset(args: DatasetConfig, split: str = "train", tokenizer=None, logger=None):
    """prepare_dataset.py:159-236 with an offline synthetic fallback."""
    assert tokenizer is not None, "you need to specify a tokenizer"
    assert split in {"train", "validation", "test"}

    if args.dataset == "synthetic":
        sizes = {
            "train": args.max_train_samples or 9000,
            "validation": args.max_val_samples or 500,
            "test": args.max_test_samples or 500,
        }
        return SyntheticTextImageDataset(args, split, tokenizer, sizes[split])

    try:
        from datasets import load_dataset

        ds = load_dataset(
            args.dataset,
            args.subset,
            cache_dir=os.path.join(args.data_dir, args.dataset),
        )["train"]
    except Exception as e:  # no egress / not cached: degrade to synthetic
        import warnings

        banner = (
            "\n" + "!" * 78 + "\n"
            f"!! DATASET FALLBACK: could not load {args.dataset!r} "
            f"({type(e).__name__}: {e});\n"
            "!! training will run on the SYNTHETIC offline dataset. If you "
            "expected real data,\n!! fix the dataset path/cache — this run's "
            "metrics are tagged synthetic_fallback.\n" + "!" * 78
        )
        warnings.warn(banner, stacklevel=2)
        if logger:
            logger.warning(banner)
        sizes = {
            "train": args.max_train_samples or 9000,
            "validation": args.max_val_samples or 500,
            "test": args.max_test_samples or 500,
        }
        ds = SyntheticTextImageDataset(args, split, tokenizer, sizes[split])
        ds.synthetic_fallback = True
        return ds

    window = _split_window(args, split, len(ds), logger)
    if len(window) < len(ds):
        ds = ds.select(window)
    if logger:
        logger.info(f"Loaded {len(ds)} {split} samples from dataset:{args.dataset}")
    return HFImageTextDataset(ds, args, tokenizer, is_train=split == "train")


def sample_test_image(args, split, tokenizer, logger=None, num: int = 10):
    """prepare_dataset.py:239-245. Always returns [-1,1] float images, also in
    --device-preprocess mode (test fixtures are host-side)."""
    test_data = get_dataset(args, split=split, tokenizer=tokenizer, logger=logger)
    rng = np.random.default_rng(0)
    out = []
    for _ in range(num):
        row = test_data[int(rng.integers(0, len(test_data)))]
        if "pixel_values" in row:
            out.append(row["pixel_values"])
        else:
            img = row["raw_image"].astype(np.float32) / 255.0
            out.append((img - 0.5) / 0.5)
    return out


class DataLoader:
    """Deterministic batcher with fixed shapes (drop_last) for jit, with an
    optional asynchronous prefetch pipeline.

    Per-host sharding for pod-scale runs: pass (shard_id, num_shards) and each
    host sees a disjoint, deterministic subset each epoch.

    ``num_workers > 0`` is the TPU-native analog of the reference's
    DataLoader worker subprocesses (/root/reference/train_unet.py:152-167):
    a background producer thread decodes rows on a ``num_workers``-thread pool
    and keeps a ``prefetch``-deep queue of collated batches, overlapping
    host-side decode with the device step. Batch order and contents are
    identical to the synchronous path (rows are mapped in order), so
    resume/replay determinism is unaffected.

    Thread-safety contract: with ``num_workers > 0`` the dataset's
    ``__getitem__`` is called concurrently from pool threads and must be
    thread-safe. The datasets this package ships (HFImageTextDataset — HF
    datasets are re-entrant for reads, PIL decode is per-call —,
    SyntheticTextImageDataset, the latent-cache dataset: all stateless per
    call) satisfy this. Custom datasets holding shared mutable state (one
    open file handle, a shared decoder object) must either guard it or be
    run with ``num_workers=0``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 42,
        drop_last: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
        collate=None,
        num_workers: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.collate = collate or collate_fn
        self.num_workers = num_workers
        if prefetch < 1:
            raise ValueError(f"prefetch must be >= 1, got {prefetch}")
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(indices)
        indices = indices[self.shard_id :: self.num_shards]
        return [
            indices[b * self.batch_size : (b + 1) * self.batch_size]
            for b in range(len(self))
        ]

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        if self.num_workers <= 0:
            for bidx in batches:
                rows = [self.dataset[int(i)] for i in bidx]
                if not rows:
                    return
                yield self.collate(rows)
            return
        yield from self._iter_async(batches)

    def _iter_async(self, batches: List[np.ndarray]) -> Iterator[dict]:
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that stays responsive to consumer abandonment
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def _produce() -> None:
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                    for bidx in batches:
                        if stop.is_set():
                            return
                        rows = list(ex.map(lambda i: self.dataset[int(i)], bidx))
                        if not rows:
                            break  # clean stop, same as the sync path
                        if not _put(("batch", self.collate(rows))):
                            return  # consumer abandoned us
                _put(("done", None))
            except BaseException as exc:  # surface worker errors to the consumer
                _put(("error", exc))

        producer = threading.Thread(
            target=_produce, name="dataloader-prefetch", daemon=True
        )
        producer.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "batch":
                    yield payload
                elif kind == "error":
                    raise payload
                else:
                    return
        finally:
            stop.set()
            # drain so a blocked producer can observe the stop flag and exit
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            producer.join(timeout=5.0)
