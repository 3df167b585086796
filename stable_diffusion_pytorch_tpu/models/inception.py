"""Native Flax InceptionV3 pool3 tower for canonical FID.

BASELINE.json's north star asks for "FID parity vs the PyTorch reference"; the
canonical FID metric is the InceptionV3 pool3 (2048-d) feature Gaussian. The
round-2 extractor (utils/fid.py:InceptionFeatureExtractor) requires torchvision
at runtime — absent in zero-egress environments — so this module provides the
TPU-native tower: the exact torchvision ``inception_v3`` architecture
(IMAGENET1K_V1 layout) in Flax/NHWC, plus :func:`convert_torchvision_inception`
which maps a torchvision state dict (``Conv2d_1a_3x3.conv.weight`` /
``Mixed_5b.branch1x1.bn.running_mean`` ... key naming) to Flax params with the
BatchNorms folded to inference-mode per-channel affines.

The moment ``inception_v3``-format weights are staged
(``data/pretrained/inception/inception_v3.{safetensors,pth,npz}``), canonical
FID runs on TPU with no torch dependency — see utils/fid.py:
FlaxInceptionFeatureExtractor and tools/fid_eval.py.

Numerical conventions matched to torchvision (verified by the cross-framework
parity test tests/test_inception.py):
- convs: no bias, symmetric padding, floor (VALID) semantics for stride-2;
- BN eps 1e-3, inference mode (running stats);
- branch avg-pools: 3x3 stride 1 pad 1 with count_include_pad=True (flax
  ``nn.avg_pool`` divides by the full window size, matching);
- final feature: global average pool of Mixed_7c -> [B, 2048].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    """Conv(no bias) + folded-BN affine + ReLU (torchvision BasicConv2d)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ph, pw = self.padding
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel,
            strides=self.strides,
            padding=((ph, ph), (pw, pw)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        # inference-mode BatchNorm folded to scale/bias at conversion time
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        x = x * scale.astype(self.dtype) + bias.astype(self.dtype)
        return nn.relu(x)


def _avg3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 avg pool, pad 1, count_include_pad=True (torch default)."""
    return nn.avg_pool(
        x, window_shape=(3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
    )


def _max3s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(
            self.pool_features, (1, 1), dtype=d, name="branch_pool"
        )(_avg3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=d, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """torchvision inception_v3 up to the 2048-d pool3 feature (fc dropped).

    Input: [B, 299, 299, 3] NHWC in [-1, 1].

    ``transform_input`` replicates torchvision's ``_transform_input``: a fixed
    per-channel affine remapping [-1, 1] (mean/std 0.5) inputs to ImageNet
    normalization (mean [.485,.456,.406], std [.229,.224,.225]). torchvision's
    ``inception_v3`` builder FORCES ``transform_input=True`` whenever weights
    are passed, so any extractor claiming parity with
    ``inception_v3(weights=IMAGENET1K_V1)`` must set it True
    (utils/fid.py:FlaxInceptionFeatureExtractor does). Default False = the
    bare architecture, for tests that drive both frameworks explicitly.
    """

    dtype: jnp.dtype = jnp.float32
    transform_input: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        x = x.astype(d)
        if self.transform_input:
            scale = jnp.asarray([0.229, 0.224, 0.225], d) / 0.5
            shift = (jnp.asarray([0.485, 0.456, 0.406], d) - 0.5) / 0.5
            x = x * scale + shift
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x)
        x = _max3s2(x)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max3s2(x)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE(dtype=d, name="Mixed_7b")(x)
        x = InceptionE(dtype=d, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # [B, 2048]


# --------------------------------------------------------------------------- #
# torchvision state-dict conversion
# --------------------------------------------------------------------------- #

_BN_EPS = 1e-3  # torchvision BasicConv2d: BatchNorm2d(eps=0.001)


def _fold_bn(state: dict, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    gamma = np.asarray(state[prefix + "bn.weight"], np.float64)
    beta = np.asarray(state[prefix + "bn.bias"], np.float64)
    mean = np.asarray(state[prefix + "bn.running_mean"], np.float64)
    var = np.asarray(state[prefix + "bn.running_var"], np.float64)
    scale = gamma / np.sqrt(var + _BN_EPS)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _convert_basic(state: dict, prefix: str) -> dict:
    # torch conv weight [O, I, kh, kw] -> flax [kh, kw, I, O]
    w = np.transpose(np.asarray(state[prefix + "conv.weight"]), (2, 3, 1, 0))
    scale, bias = _fold_bn(state, prefix)
    return {
        "conv": {"kernel": np.ascontiguousarray(w, np.float32)},
        "bn_scale": scale,
        "bn_bias": bias,
    }


def convert_torchvision_inception(state: dict) -> dict:
    """torchvision ``inception_v3`` state dict -> Flax params for
    :class:`InceptionV3Pool3` (fc/AuxLogits ignored). Accepts numpy or torch
    tensors as values."""
    state = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state.items()
    }
    out: dict = {}

    def block(name: str, branch_convs: Sequence[str]) -> None:
        out[name] = {
            b: _convert_basic(state, f"{name}.{b}.") for b in branch_convs
        }

    for stem in (
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
        "Conv2d_3b_1x1", "Conv2d_4a_3x3",
    ):
        out[stem] = _convert_basic(state, stem + ".")

    a_branches = [
        "branch1x1", "branch5x5_1", "branch5x5_2",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool",
    ]
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        block(name, a_branches)
    block("Mixed_6a", ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"])
    c_branches = [
        "branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
        "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3", "branch7x7dbl_4",
        "branch7x7dbl_5", "branch_pool",
    ]
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        block(name, c_branches)
    block("Mixed_7a", ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                       "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"])
    e_branches = [
        "branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
        "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a", "branch3x3dbl_3b",
        "branch_pool",
    ]
    for name in ("Mixed_7b", "Mixed_7c"):
        block(name, e_branches)
    return {"params": out}


def load_inception_params(model_dir: Optional[str] = "data/pretrained"):
    """Load staged inception weights, trying (in order):
    ``{model_dir}/inception/inception_v3.npz`` (pre-converted Flax params),
    ``.../inception_v3.safetensors`` / ``.pth`` (torchvision state dict,
    converted on the fly). Returns Flax params or None when nothing is staged.
    """
    import os

    if not model_dir:
        return None
    root = os.path.join(model_dir, "inception")
    npz = os.path.join(root, "inception_v3.npz")
    if os.path.exists(npz):
        flat = dict(np.load(npz))
        params: dict = {}
        for key, value in flat.items():
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = value
        return {"params": params} if "params" not in params else params
    st = os.path.join(root, "inception_v3.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return convert_torchvision_inception(load_file(st))
    pth = os.path.join(root, "inception_v3.pth")
    if os.path.exists(pth):
        import torch

        return convert_torchvision_inception(
            torch.load(pth, map_location="cpu", weights_only=True)
        )
    return None
