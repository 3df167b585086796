"""LoRA merge-based fine-tuning: target selection, merge identity, gradient
flow, and a descending train step on a tiny UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stable_diffusion_pytorch_tpu.models import lora as lora_lib
from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig
from stable_diffusion_pytorch_tpu.trainers.steps import TrainState, make_unet_train_step

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[16, 32], n_heads=4, time_emb_dim=32, n_layers=1)
    )
    params = unet.init(
        KEY, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768))
    )
    # a fresh init zero-inits every SpatialTransformer proj_out, which makes
    # the whole attention branch (and thus every LoRA factor) gradient-dead;
    # LoRA is a fine-tuning method — emulate "pretrained" by perturbing params
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [
        x + 0.05 * jax.random.normal(k, x.shape, x.dtype)
        for x, k in zip(leaves, keys)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return unet, params


def _factor_paths(lora):
    out = []

    def walk(node, path):
        if lora_lib._is_factor(node):
            out.append(path)
            return
        for k, v in node.items():
            walk(v, path + (k,))

    walk(lora, ())
    return out


def test_init_targets_attention_kernels(tiny_unet):
    _, params = tiny_unet
    lora = lora_lib.init_lora(KEY, params, rank=4, targets="attn")
    paths = _factor_paths(lora)
    assert paths, "no factors created"
    # every factor sits under a self_attn/cross_attn q/k/v/out kernel
    for p in paths:
        assert p[-1] == "kernel"
        assert p[-3] in ("self_attn", "cross_attn"), p
        assert p[-2] in ("to_q", "to_k", "to_v", "out"), p
    # attn_mlp adds the ffn kernels
    lora_mlp = lora_lib.init_lora(KEY, params, rank=4, targets="attn_mlp")
    extra = set(_factor_paths(lora_mlp)) - set(paths)
    assert extra and all("ffn" in p for p in extra)
    # factor shapes and the zero-B init
    def leaf_at(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    for p in paths:
        base_k = leaf_at(params, p)
        f = leaf_at(lora, p)
        assert f["lora_a"].shape == (base_k.shape[0], 4)
        assert f["lora_b"].shape == (4, base_k.shape[1])
        assert float(jnp.abs(f["lora_b"]).max()) == 0.0
    # rank-4 attn factors are much smaller than the base (the gap widens with
    # model width: factors grow linearly in channels, kernels quadratically)
    n = lora_lib.lora_param_count(lora)
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert 0 < n < n_base // 4


def test_merge_is_identity_at_init_and_linear_in_scale(tiny_unet):
    _, params = tiny_unet
    lora = lora_lib.init_lora(KEY, params, rank=4)
    merged = lora_lib.merge_lora(params, lora, scale=1.0)
    # B = 0 -> exact identity, and untargeted leaves are the same objects
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(merged),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a nonzero B: merge(scale=2) - base == 2 * (merge(scale=1) - base)
    lora2 = jax.tree_util.tree_map(
        lambda x: jnp.ones_like(x) * 0.01, lora
    )
    m1 = lora_lib.merge_lora(params, lora2, 1.0)
    m2 = lora_lib.merge_lora(params, lora2, 2.0)
    d1 = jax.tree_util.tree_map(lambda a, b: b - a, params, m1)
    d2 = jax.tree_util.tree_map(lambda a, b: b - a, params, m2)
    for a, b in zip(jax.tree_util.tree_leaves(d1), jax.tree_util.tree_leaves(d2)):
        np.testing.assert_allclose(np.asarray(b), 2.0 * np.asarray(a), atol=1e-6)


def test_lora_train_step_descends_and_freezes_base(tiny_unet):
    unet, params = tiny_unet
    sched = make_schedule(DDPMConfig(noise_steps=20))
    lora = lora_lib.init_lora(KEY, params, rank=4)
    tx = optax.adam(1e-2)

    transform = lambda lp: lora_lib.merge_lora(params, lp, 1.0)  # noqa: E731
    train_step, eval_step = make_unet_train_step(
        unet, None, None, sched, tx,
        train_with_cfg=False, cfg_dropout_prob=0.0, param_transform=transform,
    )
    latents = jax.random.normal(KEY, (2, 8, 8, 4))
    batch = {"latents": latents, "context_emb": jnp.zeros((2, 77, 768))}
    uncond = jnp.zeros((77, 768))
    state = TrainState.create(lora, tx)
    jit_step = jax.jit(train_step)
    losses = []
    for _ in range(6):
        state, m = jit_step(state, None, None, batch, uncond, KEY)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # the optimizer state and params ARE the lora tree (tiny), base untouched
    assert set(_factor_paths(state.params)) == set(_factor_paths(lora))
    # B moved away from zero -> the factors are actually learning
    moved = max(
        float(jnp.abs(leaf).max())
        for p, leaf in jax.tree_util.tree_leaves_with_path(state.params)
        if getattr(p[-1], "key", "") == "lora_b"
    )
    assert moved > 0.0
    # eval path applies the transform too
    ev = eval_step(state.params, None, None, batch, uncond, KEY)
    assert np.isfinite(float(ev))


def test_bad_inputs():
    with pytest.raises(ValueError, match="rank"):
        lora_lib.init_lora(KEY, {"a": {"kernel": jnp.zeros((4, 4))}}, rank=0)
    with pytest.raises(ValueError, match="targets"):
        lora_lib.init_lora(KEY, {"a": {"kernel": jnp.zeros((4, 4))}}, rank=2, targets="bogus")
    with pytest.raises(ValueError, match="no LoRA targets"):
        lora_lib.init_lora(KEY, {"a": {"kernel": jnp.zeros((4, 4))}}, rank=2)
