"""CLIP text encoder in Flax + tokenizer, with offline-first weight handling.

The reference wraps the *pretrained* HF ``CLIPTextModel``/``CLIPTokenizer`` from
``runwayml/stable-diffusion-v1-5`` (/root/reference/stable_diffusion/models/clip_model.py:56-96)
and downloads them at build time. This environment has no network egress, so:

- the transformer itself is re-implemented here in Flax (ViT-L/14 text tower:
  vocab 49408, width 768, 12 layers, 12 heads, quick-GELU, causal pre-norm blocks
  — the architecture the HF checkpoint expects);
- ``load_clip_params`` converts a locally cached HF PyTorch/safetensors checkpoint
  into our parameter tree when one exists under ``cfg.model_dir``;
- otherwise parameters are deterministically random-initialized (seed 0) so the
  full pipeline runs end-to-end offline;
- the tokenizer uses HF ``CLIPTokenizer`` when its vocab files are cached locally,
  else a deterministic hashing tokenizer with CLIP's special-token layout
  (BOS 49406 / EOS 49407, pad=EOS, max_len 77 — clip_model.py:72-85).
"""

from __future__ import annotations

import hashlib
import os
import re
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from stable_diffusion_pytorch_tpu.config import BaseConfig
from stable_diffusion_pytorch_tpu.ops.attention import multi_head_attention

BOS_TOKEN_ID = 49406
EOS_TOKEN_ID = 49407
VOCAB_SIZE = 49408


@dataclass
class ClipConfig(BaseConfig):
    """Flag surface mirrors /root/reference/stable_diffusion/models/clip_model.py:10-26."""

    tokenizer: str = field(
        default="runwayml/stable-diffusion-v1-5",
        metadata={"help": "Tokenizer to use for text encoding."},
    )
    text_encoder: str = field(
        default="runwayml/stable-diffusion-v1-5",
        metadata={"help": "Text encoder model to use."},
    )
    max_seq_len: int = field(
        default=77, metadata={"help": "Maximum sequence length for tokenized text."}
    )
    model_dir: Optional[str] = field(
        default="data/pretrained",
        metadata={"help": "Path to a directory to store the pretrained CLIP model."},
    )


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    """Pre-norm transformer block (HF CLIPEncoderLayer semantics)."""

    d_model: int
    n_heads: int
    intermediate: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        d_head = self.d_model // self.n_heads
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )

        residual = x
        h = ln("layer_norm1")(x)
        b, s, _ = h.shape
        q = dense(self.d_model, "q_proj")(h).reshape(b, s, self.n_heads, d_head)
        k = dense(self.d_model, "k_proj")(h).reshape(b, s, self.n_heads, d_head)
        v = dense(self.d_model, "v_proj")(h).reshape(b, s, self.n_heads, d_head)
        attn = multi_head_attention(
            q, k, v, scale=d_head**-0.5, mask=causal_mask
        ).reshape(b, s, self.d_model)
        x = residual + dense(self.d_model, "out_proj")(attn)

        residual = x
        h = ln("layer_norm2")(x)
        h = dense(self.intermediate, "fc1")(h)
        h = quick_gelu(h)
        x = residual + dense(self.d_model, "fc2")(h)
        return x


class CLIPTextTransformer(nn.Module):
    """The SD-1.5 text tower: 12 pre-norm layers + final LayerNorm.

    ``__call__(input_ids [B,S]) -> last_hidden_state [B,S,768]`` (the ``[0]``
    output the reference consumes, clip_model.py:87-96).
    """

    vocab_size: int = VOCAB_SIZE
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    intermediate: int = 3072
    max_positions: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        token_overrides: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """``token_overrides=(ids [K], vectors [K, D])`` substitutes learned
        embedding vectors at positions whose token id matches ``ids[j]`` —
        the textual-inversion injection point (Gal et al. 2022). Override ids
        may lie OUTSIDE the vocab (sentinels vocab_size+j); the table lookup
        is clamped since those positions are replaced anyway. Differentiable
        in ``vectors``."""
        b, s = input_ids.shape
        lookup_ids = input_ids
        if token_overrides is not None:
            lookup_ids = jnp.clip(input_ids, 0, self.vocab_size - 1)
        tok_emb = nn.Embed(
            self.vocab_size,
            self.d_model,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="token_embedding",
        )(lookup_ids)
        if token_overrides is not None:
            ov_ids, ov_vec = token_overrides
            hit = input_ids[..., None] == ov_ids[None, None, :]  # [B, S, K]
            inj = jnp.einsum(
                "bsk,kd->bsd", hit.astype(self.dtype), ov_vec.astype(self.dtype)
            )
            tok_emb = jnp.where(hit.any(-1, keepdims=True), inj, tok_emb)
        pos_emb = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_positions, self.d_model),
            jnp.float32,
        )
        x = tok_emb + pos_emb[None, :s].astype(self.dtype)

        # causal mask broadcast over [B, H, S, S]: True = masked out
        causal = jnp.triu(jnp.ones((s, s), dtype=bool), k=1)[None, None]
        for i in range(self.n_layers):
            x = CLIPEncoderLayer(
                self.d_model,
                self.n_heads,
                self.intermediate,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, causal)
        return nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name="final_layer_norm",
        )(x)


class HashTokenizer:
    """Deterministic offline tokenizer with CLIP's special-token layout.

    Not BPE — a stable word-hash into the CLIP vocab range. Only used when the
    real CLIPTokenizer vocab files are not cached locally; it keeps the entire
    pipeline runnable (and reproducible) with zero network egress.
    """

    model_max_length = 77

    def __init__(self, max_seq_len: int = 77):
        self.max_seq_len = max_seq_len

    def _word_id(self, word: str) -> int:
        digest = hashlib.sha256(word.encode("utf-8")).digest()
        # map into [0, BOS) so special ids are never collided with
        return int.from_bytes(digest[:4], "little") % BOS_TOKEN_ID

    def __call__(
        self,
        prompts: Union[str, Sequence[str]],
        max_length: Optional[int] = None,
        padding: str = "max_length",
        truncation: bool = True,
        **_: object,
    ) -> "TokenizerOutput":
        if isinstance(prompts, str):
            prompts = [prompts]
        max_len = max_length or self.max_seq_len
        rows = []
        for prompt in prompts:
            words = re.findall(r"\w+|[^\w\s]", prompt.lower())
            ids = [BOS_TOKEN_ID] + [self._word_id(w) for w in words]
            if truncation:
                ids = ids[: max_len - 1]
            ids.append(EOS_TOKEN_ID)
            if padding == "max_length":
                ids += [EOS_TOKEN_ID] * (max_len - len(ids))
            rows.append(ids)
        return TokenizerOutput(np.asarray(rows, dtype=np.int32))


class TokenizerOutput:
    def __init__(self, input_ids: np.ndarray):
        self.input_ids = input_ids


def _load_hf_tokenizer(name: str, cache_dir: Optional[str]):
    try:
        from transformers import CLIPTokenizer

        return CLIPTokenizer.from_pretrained(
            name,
            subfolder="tokenizer",
            cache_dir=cache_dir,
            use_fast=False,
            local_files_only=True,
        )
    except Exception:
        return None


def _resolve_tokenizer(cfg: ClipConfig):
    """Tokenizer resolution, best first:

    1. HF ``CLIPTokenizer`` when the hub layout is cached under model_dir.
    2. Our CLIP BPE with staged ``{model_dir}/tokenizer/vocab.json``+merges
       (token-for-token HF-equal, tests/test_bpe.py).
    3. Our CLIP BPE with the byte-level zero-merge base vocab — ids 0-511 are
       real CLIP ids (character-level segmentation), fully offline.
    """
    hf = _load_hf_tokenizer(cfg.tokenizer, cfg.model_dir)
    if hf is not None:
        return hf
    from stable_diffusion_pytorch_tpu.models.bpe import CLIPBPETokenizer

    if cfg.model_dir:
        vocab = os.path.join(cfg.model_dir, "tokenizer", "vocab.json")
        if os.path.exists(vocab):
            return CLIPBPETokenizer.from_dir(
                os.path.join(cfg.model_dir, "tokenizer"), cfg.max_seq_len
            )
    return CLIPBPETokenizer(max_seq_len=cfg.max_seq_len)


def load_clip_params(model_dir: str) -> Optional[dict]:
    """Convert a locally cached HF CLIPTextModel checkpoint to our param tree.

    Looks for ``{model_dir}/text_encoder/model.safetensors`` (or ``.bin``).
    Returns None when absent (offline random-init path).
    """
    te_dir = os.path.join(model_dir, "text_encoder")
    state = None
    st_path = os.path.join(te_dir, "model.safetensors")
    bin_path = os.path.join(te_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        state = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        state = {
            k: v.numpy()
            for k, v in torch.load(bin_path, map_location="cpu").items()
        }
    if state is None:
        return None
    return {"params": convert_text_tower(state, "text_model.")}


def convert_text_tower(state: dict, prefix: str) -> dict:
    """HF CLIPTextModel state_dict (under ``prefix``) -> our
    CLIPTextTransformer param dict (shared by the SD text-encoder loader and
    the full-CLIP scorer loader in models/clip_vision.py)."""
    p: dict = {}

    def dense(w_key: str, b_key: Optional[str] = None) -> dict:
        out = {"kernel": np.asarray(state[w_key]).T}
        if b_key is not None and b_key in state:
            out["bias"] = np.asarray(state[b_key])
        return out

    p["token_embedding"] = {
        "embedding": np.asarray(state[prefix + "embeddings.token_embedding.weight"])
    }
    p["position_embedding"] = np.asarray(
        state[prefix + "embeddings.position_embedding.weight"]
    )
    layer_idx = 0
    while f"{prefix}encoder.layers.{layer_idx}.self_attn.q_proj.weight" in state:
        lp = f"{prefix}encoder.layers.{layer_idx}."
        p[f"layer_{layer_idx}"] = {
            "q_proj": dense(lp + "self_attn.q_proj.weight", lp + "self_attn.q_proj.bias"),
            "k_proj": dense(lp + "self_attn.k_proj.weight", lp + "self_attn.k_proj.bias"),
            "v_proj": dense(lp + "self_attn.v_proj.weight", lp + "self_attn.v_proj.bias"),
            "out_proj": dense(lp + "self_attn.out_proj.weight", lp + "self_attn.out_proj.bias"),
            "fc1": dense(lp + "mlp.fc1.weight", lp + "mlp.fc1.bias"),
            "fc2": dense(lp + "mlp.fc2.weight", lp + "mlp.fc2.bias"),
            "layer_norm1": {
                "scale": np.asarray(state[lp + "layer_norm1.weight"]),
                "bias": np.asarray(state[lp + "layer_norm1.bias"]),
            },
            "layer_norm2": {
                "scale": np.asarray(state[lp + "layer_norm2.weight"]),
                "bias": np.asarray(state[lp + "layer_norm2.bias"]),
            },
        }
        layer_idx += 1
    p["final_layer_norm"] = {
        "scale": np.asarray(state[prefix + "final_layer_norm.weight"]),
        "bias": np.asarray(state[prefix + "final_layer_norm.bias"]),
    }
    return p


class CLIPModel:
    """Tokenizer + frozen Flax text encoder facade (clip_model.py:29-96).

    Not an nn.Module: it owns frozen params and exposes ``tokenize`` /
    ``encode_text`` with the reference's call surface.
    """

    @staticmethod
    def add_clip_args(model_parser):
        """DEPRECATED legacy argparse group (clip_model.py:31-54); the legacy
        ``--cache_dir`` maps onto the live config's ``model_dir``."""
        from stable_diffusion_pytorch_tpu.config import add_legacy_args

        return add_legacy_args(
            model_parser,
            ClipConfig,
            "clip",
            only=["tokenizer", "text_encoder", "max_seq_len"],
            extras=[
                {
                    "flag": "--cache_dir",
                    "type": str,
                    "default": None,
                    "help": "Path to a directory to store the pretrained clip model",
                }
            ],
        )

    def __init__(self, cfg: ClipConfig, dtype: jnp.dtype = jnp.float32):
        self.cfg = cfg
        self.max_seq_len = cfg.max_seq_len
        self.module = CLIPTextTransformer(max_positions=cfg.max_seq_len, dtype=dtype)
        self.tokenizer = _resolve_tokenizer(cfg)
        # textual inversion state: (placeholder string, sentinel ids [K],
        # learned vectors [K, 768]); None until add_textual_inversion
        self._ti = None
        params = load_clip_params(cfg.model_dir) if cfg.model_dir else None
        if params is None:
            import warnings

            warnings.warn(
                "\n" + "!" * 78 + "\n"
                f"!! CLIP FALLBACK: no pretrained text-encoder checkpoint under "
                f"{cfg.model_dir!r};\n!! using RANDOM-INIT weights (seed 0). "
                "Text conditioning is meaningless until real\n!! weights are "
                "staged (e.g. data/pretrained/text_encoder/model.safetensors)."
                "\n" + "!" * 78,
                stacklevel=2,
            )
            dummy = jnp.zeros((1, cfg.max_seq_len), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(0), dummy)
            self.pretrained = False
        else:
            self.pretrained = True
        self.params = params
        self._encode = jax.jit(self.module.apply)
        self._encode_ti = jax.jit(
            lambda p, ids, ov_ids, ov_vec: self.module.apply(
                p, ids, token_overrides=(ov_ids, ov_vec)
            )
        )

    # ------------------------------------------------------------------ #
    # textual inversion (Gal et al. 2022) — no reference counterpart
    # ------------------------------------------------------------------ #

    def add_textual_inversion(
        self, placeholder_token: str, vectors: np.ndarray
    ) -> np.ndarray:
        """Register a learned concept: ``placeholder_token`` occurrences in
        prompts tokenize to K sentinel ids (vocab_size + j, outside the real
        vocab) and ``vectors`` [K, 768] are injected at those positions in
        ``encode_text``. Returns the sentinel ids. Vectors may be updated
        later via ``set_textual_inversion_vectors`` (training loop)."""
        vectors = np.asarray(vectors, np.float32)
        assert vectors.ndim == 2 and vectors.shape[1] == self.module.d_model
        ids = np.arange(vectors.shape[0], dtype=np.int32) + VOCAB_SIZE
        self._ti = (placeholder_token, ids, vectors)
        return ids

    def set_textual_inversion_vectors(self, vectors) -> None:
        assert self._ti is not None, "call add_textual_inversion first"
        self._ti = (self._ti[0], self._ti[1], np.asarray(vectors, np.float32))

    def _plain_ids(self, text: str) -> List[int]:
        """Tokenize WITHOUT specials/padding (works for HF, our BPE, and the
        hash fallback: all accept padding=False and emit BOS/EOS to strip)."""
        if not text.strip():
            return []
        ids = list(
            np.asarray(
                self.tokenizer(
                    text, max_length=10_000, padding=False, truncation=False
                ).input_ids
            ).reshape(-1)
        )
        if ids and ids[0] == BOS_TOKEN_ID:
            ids = ids[1:]
        while ids and ids[-1] == EOS_TOKEN_ID:
            ids = ids[:-1]
        return [int(i) for i in ids]

    def _body_ids(self, text: str) -> List[int]:
        """Fragment tokenization without specials: placeholder-aware when a
        textual-inversion token is registered (expands to sentinel ids)."""
        if self._ti is None:
            return self._plain_ids(text)
        token, sentinel_ids, _ = self._ti
        body: List[int] = []
        for i, part in enumerate(text.split(token)):
            if i > 0:
                body.extend(int(s) for s in sentinel_ids)
            body.extend(self._plain_ids(part))
        return body

    @staticmethod
    def _finish_row(ids: List[int], max_len: int) -> List[int]:
        """BOS + body + EOS, truncate keeping terminal EOS, pad with EOS
        (clip_model.py:72-85 semantics)."""
        row = [BOS_TOKEN_ID] + ids + [EOS_TOKEN_ID]
        if len(row) > max_len:
            row = row[: max_len - 1] + [EOS_TOKEN_ID]
        return row + [EOS_TOKEN_ID] * (max_len - len(row))

    def _tokenize_with_placeholder(
        self, prompts: Sequence[str], max_len: int
    ) -> TokenizerOutput:
        rows = [self._finish_row(self._body_ids(p), max_len) for p in prompts]
        return TokenizerOutput(np.asarray(rows, dtype=np.int32))

    def tokenize_weighted(
        self,
        prompts: Sequence[str],
        max_length: Optional[int] = None,
    ) -> Tuple[TokenizerOutput, np.ndarray]:
        """Tokenize prompts carrying ``(word:1.3)`` emphasis syntax (see
        models/prompt_weighting.py). Returns (TokenizerOutput [B, S],
        per-token weights [B, S] f32); specials and padding get weight 1."""
        from stable_diffusion_pytorch_tpu.models.prompt_weighting import (
            parse_weighted_prompt,
        )

        max_len = max_length or self.max_seq_len
        rows, weight_rows = [], []
        for prompt in prompts:
            body: List[int] = []
            wts: List[float] = []
            for text, w in parse_weighted_prompt(prompt):
                ids = self._body_ids(text)
                body.extend(ids)
                wts.extend([w] * len(ids))
            rows.append(self._finish_row(body, max_len))
            wrow = [1.0] + wts[: max_len - 2] + [1.0]
            weight_rows.append(wrow + [1.0] * (max_len - len(wrow)))
        return (
            TokenizerOutput(np.asarray(rows, dtype=np.int32)),
            np.asarray(weight_rows, dtype=np.float32),
        )

    # ------------------------------------------------------------------ #
    # long prompts: chunked encoding beyond the 77-token window
    # ------------------------------------------------------------------ #

    def _weighted_body(self, prompt: str):
        """(body ids, per-token weights) for one prompt with emphasis syntax."""
        from stable_diffusion_pytorch_tpu.models.prompt_weighting import (
            parse_weighted_prompt,
        )

        body: List[int] = []
        wts: List[float] = []
        for text, w in parse_weighted_prompt(prompt):
            ids = self._body_ids(text)
            body.extend(ids)
            wts.extend([w] * len(ids))
        return body, wts

    def tokenize_chunked(
        self,
        prompts: Sequence[str],
        weighted: bool = False,
        num_chunks: Optional[int] = None,
    ):
        """Tokenize prompts of ANY length into K windows of 77 (BOS + 75 body
        tokens + EOS each — the A1111/lpw long-prompt scheme; no reference
        counterpart). Returns (ids [B, K, 77], weights [B, K, 77] | None, K);
        K = max chunks needed over the batch unless pinned by ``num_chunks``
        (pass it to align a negative prompt with the positive one)."""
        window = self.max_seq_len - 2  # body tokens per chunk
        bodies = []
        for p in prompts:
            if weighted:
                bodies.append(self._weighted_body(p))
            else:
                b = self._body_ids(p)
                bodies.append((b, [1.0] * len(b)))
        need = max(1, max((len(b) + window - 1) // window for b, _ in bodies))
        k = num_chunks or need
        rows, wrows = [], []
        for body, wts in bodies:
            body, wts = body[: k * window], wts[: k * window]
            chunk_ids, chunk_w = [], []
            for c in range(k):
                piece = body[c * window : (c + 1) * window]
                wpiece = wts[c * window : (c + 1) * window]
                chunk_ids.append(self._finish_row(piece, self.max_seq_len))
                wrow = [1.0] + wpiece + [1.0]
                chunk_w.append(wrow + [1.0] * (self.max_seq_len - len(wrow)))
            rows.append(chunk_ids)
            wrows.append(chunk_w)
        ids = np.asarray(rows, dtype=np.int32)
        weights = np.asarray(wrows, dtype=np.float32) if weighted else None
        return ids, weights, k

    def encode_text_chunked(
        self,
        ids: np.ndarray,
        token_weights: Optional[np.ndarray] = None,
    ) -> jnp.ndarray:
        """[B, K, 77] chunk ids -> [B, K*77, 768]: each chunk runs through the
        tower independently (position embeddings restart per chunk, matching
        the lpw scheme) and the sequences concatenate for cross-attention."""
        b, k, s = ids.shape
        emb = self.encode_text(
            np.asarray(ids).reshape(b * k, s),
            token_weights=(
                np.asarray(token_weights).reshape(b * k, s)
                if token_weights is not None
                else None
            ),
        )
        return emb.reshape(b, k * s, -1)

    def tokenize(
        self,
        prompt: Union[str, Sequence[str]] = "",
        max_length: Optional[int] = None,
        padding: str = "max_length",
        truncation: bool = True,
    ) -> TokenizerOutput:
        """clip_model.py:72-85 (pad to max_seq_len, truncate)."""
        if self._ti is not None and padding == "max_length":
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            return self._tokenize_with_placeholder(
                prompts, max_length or self.max_seq_len
            )
        out = self.tokenizer(
            prompt,
            max_length=max_length or self.max_seq_len,
            padding=padding,
            truncation=truncation,
        )
        return TokenizerOutput(np.asarray(out.input_ids, dtype=np.int32))

    def load_textual_inversion(self, ckpt_dir: str) -> str:
        """Load a trained textual-inversion checkpoint (the ``{"ti": [K, 768]}``
        params plus the ``textual_inversion.json`` sidecar written by
        TextualInversionTrainer) and register the placeholder. Returns the
        placeholder token string usable in prompts."""
        import json

        from stable_diffusion_pytorch_tpu.utils.checkpoint import (
            find_latest_checkpoint,
            load_params_for_inference,
        )

        with open(os.path.join(ckpt_dir, "textual_inversion.json")) as f:
            sidecar = json.load(f)
        path = ckpt_dir
        if not os.path.basename(path).startswith(("checkpoint", "epoch")):
            path = find_latest_checkpoint(path) or path
        vectors = np.asarray(load_params_for_inference(path)["ti"], np.float32)
        assert vectors.shape[0] == sidecar["num_vectors"], (
            f"sidecar says {sidecar['num_vectors']} vectors, checkpoint has "
            f"{vectors.shape[0]}"
        )
        self.add_textual_inversion(sidecar["placeholder_token"], vectors)
        return sidecar["placeholder_token"]

    def encode_text(
        self,
        input_ids: jnp.ndarray,
        token_weights: Optional[np.ndarray] = None,
    ) -> jnp.ndarray:
        """[B, S] token ids -> [B, S, 768] embeddings (clip_model.py:87-96).

        ``token_weights`` [B, S] applies per-token emphasis post-encoder: each
        token embedding is scaled by its weight, then the sequence is rescaled
        so its mean magnitude matches the unweighted encoding (the compel
        "original mean" scheme, with abs-mean for numerical robustness)."""
        if self._ti is not None:
            _, ids, vectors = self._ti
            emb = self._encode_ti(
                self.params,
                jnp.asarray(input_ids),
                jnp.asarray(ids),
                jnp.asarray(vectors),
            )
        else:
            emb = self._encode(self.params, jnp.asarray(input_ids))
        if token_weights is not None:
            w = jnp.asarray(token_weights, jnp.float32)
            f = emb.astype(jnp.float32)
            prev = jnp.mean(jnp.abs(f), axis=(-2, -1), keepdims=True)
            f = f * w[..., None]
            new = jnp.mean(jnp.abs(f), axis=(-2, -1), keepdims=True)
            emb = (f * (prev / jnp.maximum(new, 1e-8))).astype(emb.dtype)
        return emb
