"""CLIP vision tower + CLIP-score evaluation.

No counterpart in /root/reference (which uses CLIP only as a frozen TEXT
encoder, clip_model.py:62-70) — capability extension: the standard CLIP score
(text-image alignment, Hessel et al. 2021 "CLIPScore") for evaluating
generated images, next to FID (utils/fid.py).

The vision transformer mirrors HF ``CLIPVisionModel`` semantics (patch conv,
class token, learned positions, pre-LN encoder — reusing CLIPEncoderLayer from
models/clip.py with no causal mask — post-LN pooled CLS) plus the
``visual_projection`` / ``text_projection`` heads of the full HF ``CLIPModel``.
Weights load from a locally cached full-CLIP checkpoint
(``{model_dir}/clip_full/model.safetensors``, e.g. openai/clip-vit-large-
patch14); offline the scorer random-inits with a loud warning (scores are then
meaningless but the machinery is exercised end-to-end).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from stable_diffusion_pytorch_tpu.models.clip import (
    CLIPEncoderLayer,
    CLIPTextTransformer,
    convert_text_tower,
)

# CLIP preprocessing constants (OpenAI)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionTransformer(nn.Module):
    """Image tower: [B, H, W, 3] (CLIP-normalized NHWC) -> pooled CLS [B, d]."""

    image_size: int = 224
    patch_size: int = 14
    d_model: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    intermediate: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        b = pixel_values.shape[0]
        x = nn.Conv(
            self.d_model,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        x = x.reshape(b, -1, self.d_model)  # [B, P, D]
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.d_model,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.d_model)), x],
            axis=1,
        )
        n_pos = (self.image_size // self.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n_pos, self.d_model),
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name="pre_layernorm",
        )(x)
        for i in range(self.n_layers):
            x = CLIPEncoderLayer(
                self.d_model,
                self.n_heads,
                self.intermediate,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, None)  # bidirectional: no causal mask
        pooled = x[:, 0]
        return nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name="post_layernorm",
        )(pooled)


def preprocess_images(images: np.ndarray, image_size: int = 224) -> np.ndarray:
    """uint8 HWC images [N, H, W, 3] -> CLIP-normalized [N, S, S, 3] f32
    (bilinear resize of the full frame — the square-generation case)."""
    import jax.image

    x = jnp.asarray(images, jnp.float32) / 255.0
    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = jax.image.resize(
            x, (x.shape[0], image_size, image_size, 3), method="bilinear"
        )
    return np.asarray((x - CLIP_MEAN) / CLIP_STD, np.float32)


def load_full_clip_params(model_dir: Optional[str]):
    """``{model_dir}/clip_full/model.safetensors`` (a full HF CLIPModel, e.g.
    openai/clip-vit-large-patch14) -> (text_params, vision_params,
    text_projection [d, p], visual_projection [d, p]). None when absent."""
    if not model_dir:
        return None
    root = os.path.join(model_dir, "clip_full")
    state = None
    st = os.path.join(root, "model.safetensors")
    bn = os.path.join(root, "pytorch_model.bin")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        state = load_file(st)
    elif os.path.exists(bn):
        import torch

        state = {
            k: v.numpy() for k, v in torch.load(bn, map_location="cpu").items()
        }
    if state is None:
        return None

    text = {"params": convert_text_tower(state, "text_model.")}

    prefix = "vision_model."
    v: dict = {}

    def dense(w_key, b_key=None):
        out = {"kernel": np.asarray(state[w_key]).T}
        if b_key is not None and b_key in state:
            out["bias"] = np.asarray(state[b_key])
        return out

    def norm(key):
        return {
            "scale": np.asarray(state[key + ".weight"]),
            "bias": np.asarray(state[key + ".bias"]),
        }

    # HF patch conv weight [D, 3, P, P] -> flax [P, P, 3, D]
    v["patch_embedding"] = {
        "kernel": np.transpose(
            np.asarray(state[prefix + "embeddings.patch_embedding.weight"]),
            (2, 3, 1, 0),
        )
    }
    v["class_embedding"] = np.asarray(
        state[prefix + "embeddings.class_embedding"]
    )
    v["position_embedding"] = np.asarray(
        state[prefix + "embeddings.position_embedding.weight"]
    )
    v["pre_layernorm"] = norm(prefix + "pre_layrnorm")  # HF's typo'd name
    i = 0
    while f"{prefix}encoder.layers.{i}.self_attn.q_proj.weight" in state:
        lp = f"{prefix}encoder.layers.{i}."
        v[f"layer_{i}"] = {
            "q_proj": dense(lp + "self_attn.q_proj.weight", lp + "self_attn.q_proj.bias"),
            "k_proj": dense(lp + "self_attn.k_proj.weight", lp + "self_attn.k_proj.bias"),
            "v_proj": dense(lp + "self_attn.v_proj.weight", lp + "self_attn.v_proj.bias"),
            "out_proj": dense(lp + "self_attn.out_proj.weight", lp + "self_attn.out_proj.bias"),
            "fc1": dense(lp + "mlp.fc1.weight", lp + "mlp.fc1.bias"),
            "fc2": dense(lp + "mlp.fc2.weight", lp + "mlp.fc2.bias"),
            "layer_norm1": norm(lp + "layer_norm1"),
            "layer_norm2": norm(lp + "layer_norm2"),
        }
        i += 1
    v["post_layernorm"] = norm(prefix + "post_layernorm")

    text_proj = np.asarray(state["text_projection.weight"]).T
    visual_proj = np.asarray(state["visual_projection.weight"]).T
    return text, {"params": v}, text_proj, visual_proj


class CLIPScorer:
    """Frozen full-CLIP facade computing the CLIP score
    (100 * max(cos(text_emb, image_emb), 0); Hessel et al. 2021)."""

    def __init__(
        self,
        tokenizer,
        model_dir: Optional[str] = "data/pretrained",
        text_cfg: Optional[dict] = None,
        vision_cfg: Optional[dict] = None,
        params=None,
    ):
        self.tokenizer = tokenizer
        self.text_tower = CLIPTextTransformer(**(text_cfg or {}))
        self.vision_tower = CLIPVisionTransformer(**(vision_cfg or {}))
        loaded = params if params is not None else load_full_clip_params(model_dir)
        if loaded is None:
            import warnings

            warnings.warn(
                "\n" + "!" * 78 + "\n"
                "!! CLIP-SCORE FALLBACK: no full-CLIP checkpoint under "
                f"{model_dir!r}/clip_full;\n"
                "!! using RANDOM-INIT weights — scores are meaningless until "
                "real weights are staged.\n" + "!" * 78
            )
            key = jax.random.PRNGKey(0)
            d_t = self.text_tower.d_model
            d_v = self.vision_tower.d_model
            proj = 768
            self.text_params = self.text_tower.init(
                key, jnp.zeros((1, 8), jnp.int32)
            )
            self.vision_params = self.vision_tower.init(
                key,
                jnp.zeros(
                    (1, self.vision_tower.image_size, self.vision_tower.image_size, 3)
                ),
            )
            self.text_proj = np.asarray(
                jax.random.normal(jax.random.fold_in(key, 1), (d_t, proj)) * 0.02
            )
            self.visual_proj = np.asarray(
                jax.random.normal(jax.random.fold_in(key, 2), (d_v, proj)) * 0.02
            )
            self.pretrained = False
        else:
            self.text_params, self.vision_params, self.text_proj, self.visual_proj = loaded
            self.pretrained = True
        self._embed_text = jax.jit(self._text_fn)
        self._embed_image = jax.jit(self._image_fn)

    def _text_fn(self, ids):
        hidden = self.text_tower.apply(self.text_params, ids)
        # pooled feature = hidden state at the EOT token (the largest id)
        pooled = hidden[jnp.arange(hidden.shape[0]), jnp.argmax(ids, axis=-1)]
        emb = pooled @ jnp.asarray(self.text_proj)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def _image_fn(self, pixels):
        pooled = self.vision_tower.apply(self.vision_params, pixels)
        emb = pooled @ jnp.asarray(self.visual_proj)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def score(
        self, images: np.ndarray, prompts: Sequence[str], batch: int = 16
    ) -> float:
        """Mean CLIP score over (image, prompt) pairs. images: uint8 [N,H,W,3]."""
        assert len(images) == len(prompts), "one prompt per image"
        sims = []
        for i in range(0, len(images), batch):
            px = preprocess_images(
                np.asarray(images[i : i + batch]), self.vision_tower.image_size
            )
            ids = np.asarray(
                self.tokenizer(
                    list(prompts[i : i + batch]),
                    max_length=77,
                    padding="max_length",
                    truncation=True,
                ).input_ids,
                np.int32,
            )
            te = np.asarray(self._embed_text(ids))
            ie = np.asarray(self._embed_image(px))
            sims.append((te * ie).sum(-1))
        sim = np.concatenate(sims)
        return float(100.0 * np.maximum(sim, 0.0).mean())
