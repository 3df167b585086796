"""UNet topology and forward tests."""

import jax
import jax.numpy as jnp
import pytest

from stable_diffusion_pytorch_tpu.models.unet import (
    UNetModel,
    UnetConfig,
    plan_input_blocks,
    plan_output_blocks,
)

KEY = jax.random.PRNGKey(0)


def tiny_unet(**kw):
    cfg = UnetConfig(
        channels_list=[32, 64], n_heads=4, time_emb_dim=64, n_layers=1, **kw
    )
    return UNetModel.from_config(4, 8, cfg)


def test_forward_shape_and_conditioning():
    unet = tiny_unet()
    x = jax.random.normal(KEY, (2, 8, 8, 4))
    t = jnp.array([0, 10], jnp.int32)
    ctx = jax.random.normal(KEY, (2, 77, 768))
    params = unet.init(KEY, x, t, ctx)
    # zero-init residual convs (proj_out/out_conv) make attention/resblocks
    # identity at init — perturb all params so conditioning paths are live
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape, p.dtype), params
    )
    eps = unet.apply(params, x, t, ctx)
    assert eps.shape == x.shape
    # context must matter (cross-attention wired through)
    ctx2 = jax.random.normal(jax.random.PRNGKey(9), ctx.shape)
    eps2 = unet.apply(params, x, t, ctx2)
    assert not jnp.allclose(eps, eps2)
    # timestep must matter
    eps3 = unet.apply(params, x, jnp.array([500, 900], jnp.int32), ctx)
    assert not jnp.allclose(eps, eps3)


def test_default_attention_placement():
    """SURVEY.md §2.4 item 8: with attention_resolutions=[0,1], attention only
    fires at level 0 (attn_mult starts at 1, 0 never matches)."""
    cfg = UnetConfig()  # channels [160, 320], attn res [0, 1]
    in_plan, skips, mid_ch, _, attn_mult = plan_input_blocks(
        cfg.channels_list[0], cfg.channels_list, cfg.num_res_blocks,
        cfg.attention_resolutions,
    )
    res_blocks = [b for b in in_plan if b[0] == "res"]
    # level 0 blocks (first num_res_blocks) have attention, level 1 don't
    assert [b[3] for b in res_blocks] == [True, True, False, False]
    assert mid_ch == 320 and attn_mult == 2
    out_plan, out_ch = plan_output_blocks(
        cfg.channels_list, cfg.num_res_blocks, cfg.attention_resolutions,
        skips, mid_ch, attn_mult,
    )
    # reversed levels: level1 (3 blocks, no attn, last has upsample), level0 (3 blocks, attn)
    assert [b[3] for b in out_plan] == [False, False, False, True, True, True]
    assert [b[4] for b in out_plan] == [False, False, True, False, False, False]
    assert out_ch == 160


def test_skip_channel_bookkeeping():
    """Output-block input channels must consume the skip stack in reverse
    (models/utils.py:155-159)."""
    cfg = UnetConfig(channels_list=[32, 64], n_heads=4)
    in_plan, skips, mid_ch, _, mult = plan_input_blocks(
        32, [32, 64], 2, [0, 1]
    )
    assert skips == [32, 32, 32, 32, 64, 64]
    out_plan, _ = plan_output_blocks([32, 64], 2, [0, 1], skips, mid_ch, mult)
    # in_ch at each output block = prev out + popped skip
    assert [b[1] for b in out_plan] == [64 + 64, 64 + 64, 64 + 32, 64 + 32, 32 + 32, 32 + 32]


def test_sd15_plan_attention_at_three_levels():
    from stable_diffusion_pytorch_tpu.models.presets import sd15_unet_config

    cfg = sd15_unet_config()
    in_plan, skips, mid_ch, _, mult = plan_input_blocks(
        cfg.channels_list[0], cfg.channels_list, cfg.num_res_blocks,
        cfg.attention_resolutions,
    )
    res = [b for b in in_plan if b[0] == "res"]
    # attention at levels 0,1,2 (attn_mult 1,2,4) but not level 3 (8)
    assert [b[3] for b in res] == [True] * 6 + [False] * 2
    assert mid_ch == 1280 and mult == 8


def test_unet_no_context_dim_assertion():
    unet = tiny_unet()
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    bad_ctx = jnp.ones((1, 77, 100))
    with pytest.raises(AssertionError):
        unet.init(KEY, x, t, bad_ctx)


def test_materialized_skip_concat_env_gate_is_exact(monkeypatch):
    """SD_MATERIALIZE_SKIP_CONCAT=1 (the hardware-A/B escape hatch for the
    concat-free up path) must reproduce the default path bit-for-bit — same
    params, same outputs."""
    unet = tiny_unet()
    x = jax.random.normal(KEY, (2, 8, 8, 4))
    t = jnp.array([3, 40], jnp.int32)
    ctx = jax.random.normal(KEY, (2, 7, 768))
    params = unet.init(KEY, x, t, ctx)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape, p.dtype), params
    )
    eps_default = unet.apply(params, x, t, ctx)
    monkeypatch.setenv("SD_MATERIALIZE_SKIP_CONCAT", "1")
    eps_concat = unet.apply(params, x, t, ctx)
    assert jnp.array_equal(eps_default, eps_concat) or jnp.allclose(
        eps_default, eps_concat, atol=1e-6, rtol=1e-6
    )


@pytest.mark.parametrize("policy", ["full", "conv-save", "dots_saveable"])
def test_remat_policies_match_no_remat_gradients(policy):
    """Every remat policy is a pure memory/FLOP trade: outputs and gradients
    must be bitwise-equivalent (same ops, f32 on CPU) to the no-remat UNet.
    conv-save saves only the checkpoint_name'd ResBlock conv outputs
    (models/blocks.py) and rematerializes GN/SiLU/attention."""
    cfg = UnetConfig(
        channels_list=[32, 64], n_heads=4, time_emb_dim=64, n_layers=1
    )
    base = UNetModel.from_config(4, 8, cfg)
    rematted = UNetModel.from_config(4, 8, cfg, remat=policy)

    x = jax.random.normal(KEY, (2, 8, 8, 4))
    t = jnp.array([3, 700], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 768))
    params = base.init(KEY, x, t, ctx)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape, p.dtype), params
    )

    def loss(model, p):
        return jnp.mean(model.apply(p, x, t, ctx) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(rematted, p))(params)
    assert jnp.allclose(l0, l1, rtol=1e-6, atol=1e-7)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        assert jnp.allclose(a, b, rtol=1e-5, atol=1e-7), (a - b)


def test_remat_unknown_policy_raises():
    unet = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[32, 64], n_heads=4, n_layers=1),
        remat="bogus",
    )
    x = jnp.zeros((1, 8, 8, 4))
    with pytest.raises(ValueError, match="unknown remat policy"):
        unet.init(KEY, x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)))
