"""LoRA (Hu et al. 2021) parameter-efficient fine-tuning for the UNet.

No reference counterpart — a capability extension (the ecosystem analog is
diffusers' ``train_text_to_image_lora.py``): freeze the 860M-param UNet and
train only rank-r factors on the attention (optionally MLP) projections, so
a fine-tune's trainable state and checkpoint shrink by ~3 orders of
magnitude (rank 8 over the SD-1.5 attention kernels: ~0.8M params vs 860M).

TPU-first design: instead of inserting adapter matmuls into every attention
``apply`` (two extra skinny GEMMs per layer per token, each MXU-hostile at
rank 8-64), the low-rank update is MERGED into the frozen base kernels once
per train step — ``W_eff = W + (alpha/rank) * A @ B`` — and the unmodified
UNet runs at full speed. The merge costs a handful of [in,r]@[r,out] weight
GEMMs (microseconds next to the forward), the gradient flows through the
merge into (A, B) only, and sampling from a LoRA checkpoint pays zero
runtime overhead after a one-time merge. Numerically this is the exact same
function of (A, B) as the adapter form, so training dynamics are identical.

The LoRA tree mirrors the UNet param tree shape-wise, holding
``{"lora_a": [in, r], "lora_b": [r, out]}`` at each targeted kernel leaf and
omitting everything else, so Orbax checkpointing, optimizer state, EMA, and
the ZeRO/FSDP sharding rules all apply unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# parents of a targeted "kernel" leaf, per target set
_ATTN_MODULES = ("self_attn", "cross_attn")
_ATTN_LEAVES = ("to_q", "to_k", "to_v", "out")
_MLP_SUFFIXES = (("ffn", "geglu", "proj"), ("ffn", "out"))

TARGET_SETS = ("attn", "attn_mlp")


def is_lora_target(path: Tuple[str, ...], leaf: jnp.ndarray, targets: str) -> bool:
    """True if the param at ``path`` (names root->leaf) takes a LoRA factor.

    ``targets="attn"`` selects the q/k/v/out projection kernels of every
    self/cross attention; ``"attn_mlp"`` additionally selects the GEGLU
    proj and FF out kernels. Only 2-D ``kernel`` leaves qualify.
    """
    if targets not in TARGET_SETS:
        raise ValueError(f"unknown lora targets {targets!r}; use one of {TARGET_SETS}")
    if path[-1] != "kernel" or leaf.ndim != 2:
        return False
    parents = path[:-1]
    if (
        len(parents) >= 2
        and parents[-2] in _ATTN_MODULES
        and parents[-1] in _ATTN_LEAVES
    ):
        return True
    if targets == "attn_mlp":
        for suffix in _MLP_SUFFIXES:
            if parents[-len(suffix):] == suffix:
                return True
    return False


def _path_names(key_path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", str(k)) for k in key_path)


def init_lora(
    key: jax.Array, params: Any, rank: int, targets: str = "attn"
) -> Dict:
    """Build the LoRA tree for ``params``: at every targeted kernel [in, out],
    ``lora_a`` [in, r] ~ N(0, 1/r) and ``lora_b`` [r, out] = 0 (Hu et al.
    2021 §4.1 — the zero B makes step 0 exactly the base model)."""
    if rank <= 0:
        raise ValueError(f"lora rank must be positive, got {rank}")
    flat = jax.tree_util.tree_leaves_with_path(params)
    tree: Dict = {}
    n_targeted = 0
    for key_path, leaf in flat:
        names = _path_names(key_path)
        if not is_lora_target(names, leaf, targets):
            continue
        key, sub = jax.random.split(key)
        node = tree
        for name in names[:-1]:
            node = node.setdefault(name, {})
        d_in, d_out = leaf.shape
        node["kernel"] = {
            "lora_a": (
                jax.random.normal(sub, (d_in, rank), jnp.float32) / jnp.sqrt(rank)
            ),
            "lora_b": jnp.zeros((rank, d_out), jnp.float32),
        }
        n_targeted += 1
    if n_targeted == 0:
        raise ValueError(
            f"no LoRA targets matched in the param tree (targets={targets!r})"
        )
    return tree


def _is_factor(node: Any) -> bool:
    return isinstance(node, dict) and "lora_a" in node and "lora_b" in node


def merge_lora(params: Any, lora: Dict, scale: float) -> Any:
    """W_eff = W + scale * A @ B at every factored leaf; all other subtrees
    are returned by reference (no copy). Differentiable in ``lora``."""

    def walk(base, node):
        if _is_factor(node):
            delta = node["lora_a"] @ node["lora_b"]
            return (base.astype(jnp.float32) + scale * delta).astype(base.dtype)
        out = dict(base)
        for name, child in node.items():
            out[name] = walk(base[name], child)
        return out

    return walk(params, lora)


def lora_param_count(lora: Dict) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(lora))
