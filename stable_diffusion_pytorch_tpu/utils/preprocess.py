"""On-device (jitted) image preprocessing for the pod-scale input pipeline.

BASELINE.json config #5: host CPUs only decode bytes to fixed-shape uint8
arrays; resize / crop / flip / normalize run on the TPU inside jit, overlapped
with the train step. This replaces the reference's per-worker torchvision
transforms (prepare_dataset.py:127-142) whose host cost bounds pod-scale
throughput.

All functions take static shapes (XLA requirement): the host side standardizes
each decoded image to one fixed [H0, W0, 3] uint8 buffer (short side >= the
target resolution).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def device_preprocess(
    images: jnp.ndarray,
    resolution: int,
    center_crop: bool = True,
    random_flip: bool = False,
    key: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """[B, H0, W0, 3] uint8 -> [B, res, res, 3] in [-1, 1].

    Resize (bilinear, short side == resolution) -> crop -> optional flip ->
    normalize, matching the host transform semantics in utils/data.py.
    """
    b, h0, w0, c = images.shape
    x = images.astype(jnp.float32)

    if h0 < w0:
        new_h, new_w = resolution, max(resolution, round(w0 * resolution / h0))
    else:
        new_h, new_w = max(resolution, round(h0 * resolution / w0)), resolution
    x = jax.image.resize(x, (b, new_h, new_w, c), method="bilinear")

    if center_crop or key is None:
        top = (new_h - resolution) // 2
        left = (new_w - resolution) // 2
        x = jax.lax.dynamic_slice(
            x, (0, top, left, 0), (b, resolution, resolution, c)
        )
    else:
        k_top, k_left, key = jax.random.split(key, 3)
        top = jax.random.randint(k_top, (), 0, new_h - resolution + 1)
        left = jax.random.randint(k_left, (), 0, new_w - resolution + 1)
        x = jax.lax.dynamic_slice(
            x, (0, top, left, 0), (b, resolution, resolution, c)
        )

    if random_flip and key is not None:
        flip = jax.random.bernoulli(key, 0.5, (b, 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)

    x = x / 255.0
    return ((x - 0.5) / 0.5).astype(dtype)


def make_preprocess_fn(resolution: int, center_crop: bool, random_flip: bool,
                       dtype: jnp.dtype = jnp.float32):
    """Jit-ready closure with static config baked in."""

    def fn(images, key=None):
        return device_preprocess(
            images, resolution, center_crop, random_flip, key, dtype
        )

    return jax.jit(fn)
