"""ControlNet (Zhang et al. 2023): zero-init no-op, encoder transplant,
training, and hint-steered sampling. No reference counterpart (ecosystem
analog: diffusers ControlNetModel / train_controlnet.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.models.controlnet import (
    ControlledUNetModel,
    ControlNet,
    init_controlnet_from_unet,
)
from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig

CFG = UnetConfig(channels_list=[16, 32], n_heads=4, time_emb_dim=32, n_layers=1)


@pytest.fixture(scope="module")
def tiny():
    key = jax.random.PRNGKey(0)
    unet = UNetModel.from_config(4, 8, CFG)
    cn = ControlNet.from_unet_config(4, 8, CFG, hint_downsamples=2)
    full = ControlledUNetModel(unet=unet, controlnet=cn)
    x = jax.random.normal(key, (2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 768))
    hint = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    params = full.init(key, x, t, ctx, hint)
    return unet, cn, full, params, x, t, ctx, hint


def _perturb(tree, scale=0.05, seed=42):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [l + scale * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )


def test_zero_init_is_exact_noop(tiny):
    unet, cn, full, params, x, t, ctx, hint = tiny
    out_ctrl = full.apply(params, x, t, ctx, hint)
    out_base = unet.apply({"params": params["params"]["unet"]}, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(out_ctrl), np.asarray(out_base))


def test_control_scale_zero_disables_perturbed_branch(tiny):
    unet, cn, full, params, x, t, ctx, hint = tiny
    p2 = {
        "params": {
            "unet": params["params"]["unet"],
            "controlnet": _perturb(params["params"]["controlnet"]),
        }
    }
    out_base = unet.apply({"params": params["params"]["unet"]}, x, t, ctx)
    out_on = full.apply(p2, x, t, ctx, hint)
    out_off = full.apply(p2, x, t, ctx, hint, control_scale=0.0)
    assert not np.allclose(np.asarray(out_on), np.asarray(out_base))
    np.testing.assert_allclose(
        np.asarray(out_off), np.asarray(out_base), atol=1e-6
    )
    # the hint itself matters once the branch is non-zero
    out_h2 = full.apply(p2, x, t, ctx, hint * -1.0)
    assert not np.allclose(np.asarray(out_h2), np.asarray(out_on))


def test_encoder_transplant_copies_unet_weights(tiny):
    unet, cn, full, params, x, t, ctx, hint = tiny
    up = {"params": _perturb(params["params"]["unet"], seed=7)}
    cp = {"params": params["params"]["controlnet"]}
    tp = init_controlnet_from_unet(up, cp)
    for name in ("conv_in", "time_fc1", "mid_attn", "mid_res1"):
        a = jax.tree_util.tree_leaves(tp["params"][name])
        b = jax.tree_util.tree_leaves(up["params"][name])
        for l1, l2 in zip(a, b):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # controlnet-only leaves keep their fresh init
    assert "hint_embedding" in tp["params"]
    assert "zero_conv_0" in tp["params"]
    # and no buffer aliasing with the source (donation safety)
    src = jax.tree_util.tree_leaves(up["params"]["conv_in"])[0]
    dst = jax.tree_util.tree_leaves(tp["params"]["conv_in"])[0]
    assert src.unsafe_buffer_pointer() != dst.unsafe_buffer_pointer()


def test_controlnet_train_step_descends(tiny):
    import optax

    from stable_diffusion_pytorch_tpu.models.clip import CLIPTextTransformer
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
    from stable_diffusion_pytorch_tpu.trainers.steps import (
        TrainState,
        make_controlnet_train_step,
    )

    unet, cn, full, params, x, t, ctx, hint = tiny
    key = jax.random.PRNGKey(0)
    clip = CLIPTextTransformer(d_model=768, n_layers=1, n_heads=4, intermediate=64)
    ids = jnp.zeros((2, 8), jnp.int32)
    clip_params = clip.init(key, ids[:1])
    sched = make_schedule(DDPMConfig(noise_steps=20))
    tx = optax.adam(1e-3)

    unet_params = {"params": _perturb(params["params"]["unet"])}
    cn_params = init_controlnet_from_unet(
        unet_params, {"params": params["params"]["controlnet"]}
    )
    train_step, eval_step = make_controlnet_train_step(
        full, clip, None, sched, tx, cfg_dropout_prob=0.0
    )
    jit_step = jax.jit(train_step, donate_argnums=(0,))
    state = TrainState.create(cn_params, tx)
    batch = {
        "latents": jax.random.normal(key, (2, 8, 8, 4)),
        "input_ids": ids,
        "hint": hint,
    }
    uncond = jnp.zeros((8,), jnp.int32)
    losses = []
    for _ in range(8):
        state, metrics = jit_step(
            state, unet_params, clip_params, None, batch, uncond, key
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not descend: {losses}"
    ev = eval_step(state.params, unet_params, clip_params, None, batch, uncond, key)
    assert np.isfinite(float(ev))


def test_sample_with_control_hint_cfg_path(tiny):
    """LatentDiffusion.sample(control_hint=...) compiles and runs through the
    CFG-doubled batch (hint tiled), and the hint changes the output."""
    from stable_diffusion_pytorch_tpu.config import load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models

    _, cfg = load_config([
        "--channels-list", "16,32", "--n-heads", "4", "--time-emb-dim", "32",
        "--n-layers", "1", "--autoencoder-channels-list", "8,16", "--groups", "4",
        "--noise-steps", "20",
    ])
    model = build_models(cfg.model, init_image_size=16)
    cn = ControlNet.from_unet_config(4, 4, cfg.model.unet, hint_downsamples=1)
    key = jax.random.PRNGKey(0)
    lat_shape = model.latent_shape(1, 16)
    cn_params = cn.init(
        key,
        jnp.zeros(lat_shape),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
        jnp.zeros((1, 16, 16, 3)),
    )
    cn_params = {"params": _perturb(cn_params["params"], scale=0.02)}
    model.attach_controlnet(cn, cn_params)

    ctx = model.encode_prompts(["a red circle"]).astype(jnp.float32)
    noise = jax.random.normal(key, lat_shape)
    hint_a = jnp.ones((1, 16, 16, 3)) * 0.5
    hint_b = -hint_a
    kwargs = dict(
        context_emb=ctx, guidance_scale=7.5, time_steps=3, sampler="ddim", key=key
    )
    out_a = np.asarray(model.sample(noised_sample=noise, control_hint=hint_a, **kwargs))
    out_b = np.asarray(model.sample(noised_sample=noise, control_hint=hint_b, **kwargs))
    out_plain = np.asarray(model.sample(noised_sample=noise, **kwargs))
    assert np.isfinite(out_a).all()
    assert not np.allclose(out_a, out_b)
    assert not np.allclose(out_a, out_plain)


def test_multi_controlnet_composition():
    """Two attached ControlNets: residuals sum; per-net scales behave — scale
    0 on one net reduces to the other net alone."""
    from stable_diffusion_pytorch_tpu.config import load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models

    _, cfg = load_config([
        "--channels-list", "16,32", "--n-heads", "4", "--time-emb-dim", "32",
        "--n-layers", "1", "--autoencoder-channels-list", "8,16", "--groups", "4",
        "--noise-steps", "20",
    ])
    model = build_models(cfg.model, init_image_size=16)
    key = jax.random.PRNGKey(0)
    lat_shape = model.latent_shape(1, 16)

    nets, params = [], []
    for i in range(2):
        cn = ControlNet.from_unet_config(4, 4, cfg.model.unet, hint_downsamples=1)
        p = cn.init(
            jax.random.fold_in(key, i),
            jnp.zeros(lat_shape),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 768)),
            jnp.zeros((1, 16, 16, 3)),
        )
        nets.append(cn)
        params.append({"params": _perturb(p["params"], 0.02, seed=10 + i)})
    model.attach_controlnet(nets, params)

    ctx = model.encode_prompts(["a red circle"]).astype(jnp.float32)
    noise = jax.random.normal(key, lat_shape)
    hints = [jnp.ones((1, 16, 16, 3)) * 0.5, -jnp.ones((1, 16, 16, 3)) * 0.3]
    kwargs = dict(
        context_emb=ctx, guidance_scale=7.5, time_steps=2, sampler="ddim", key=key
    )
    both = np.asarray(
        model.sample(noised_sample=noise, control_hint=hints,
                     control_scale=[1.0, 1.0], **kwargs)
    )
    first_only_scaled = np.asarray(
        model.sample(noised_sample=noise, control_hint=hints,
                     control_scale=[1.0, 0.0], **kwargs)
    )
    assert np.isfinite(both).all()
    assert not np.allclose(both, first_only_scaled)

    # second net at scale 0 == only the first net attached
    model.attach_controlnet(nets[0], params[0])
    first_only = np.asarray(
        model.sample(noised_sample=noise, control_hint=hints[0], **kwargs)
    )
    np.testing.assert_allclose(first_only_scaled, first_only, atol=1e-5)


def test_img2img_and_inpaint_with_control(tmp_path):
    """The img2img and inpaint pipelines accept control_image once a
    ControlNet is attached; the hint changes both results."""
    from stable_diffusion_pytorch_tpu.config import load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models
    from stable_diffusion_pytorch_tpu.pipeline import img2img, inpaint

    _, cfg = load_config([
        "--channels-list", "16,32", "--n-heads", "4", "--time-emb-dim", "32",
        "--n-layers", "1", "--autoencoder-channels-list", "8,16", "--groups", "4",
        "--noise-steps", "20",
    ])
    model = build_models(cfg.model, init_image_size=16)
    cn = ControlNet.from_unet_config(4, 4, cfg.model.unet, hint_downsamples=1)
    key = jax.random.PRNGKey(0)
    cn_params = cn.init(
        key,
        jnp.zeros(model.latent_shape(1, 16)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
        jnp.zeros((1, 16, 16, 3)),
    )
    model.attach_controlnet(cn, {"params": _perturb(cn_params["params"], 0.02)})

    rng = np.random.default_rng(0)
    init = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    hint_a = np.ones((16, 16, 3), np.float32) * 0.5
    kwargs = dict(
        prompt="x", image_size=16, time_steps=3, guidance_scale=7.5,
        save_dir=None, seed=1,
    )
    out_a = img2img(model, init, control_image=hint_a, **kwargs)
    out_b = img2img(model, init, control_image=-hint_a, **kwargs)
    out_p = img2img(model, init, **kwargs)
    assert out_a.shape == (16, 16, 3)
    assert not np.array_equal(out_a, out_b)
    assert not np.array_equal(out_a, out_p)

    mask = np.zeros((16, 16), np.float32)
    mask[4:12, 4:12] = 1.0
    ip_a = inpaint(model, init, mask, control_image=hint_a, **kwargs)
    ip_b = inpaint(model, init, mask, control_image=-hint_a, **kwargs)
    assert ip_a.shape == (16, 16, 3)
    assert not np.array_equal(ip_a, ip_b)


def test_train_controlnet_e2e_and_txt2img_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train_controlnet

    ckpt = str(tmp_path / "ckpt")
    tiny_args = [
        "--dataset", "synthetic",
        "--train-batch-size", "1",
        "--eval-batch-size", "1",
        "--gradient-accumulation-steps", "1",
        "--max-train-samples", "4",
        "--max-val-samples", "2",
        "--max-test-samples", "2",
        "--channels-list", "16,32",
        "--n-heads", "4",
        "--time-emb-dim", "32",
        "--n-layers", "1",
        "--autoencoder-channels-list", "8,16",
        "--groups", "4",
        "--resolution", "16",
        "--noise-steps", "20",
        "--num-devices", "2",
    ]
    train_controlnet.main(tiny_args + [
        "--max-train-steps", "3",
        "--log-interval", "2",
        # chain coverage for ControlNetTrainer._chain_args (frozen towers as
        # pre-args, uncond tokens as post-arg); boundary assertions below
        "--steps-per-dispatch", "2",
        "--ckpt-dir", ckpt,
        "--checkpointing-steps", "2",
        "--logging-dir", str(tmp_path / "logs"),
    ])
    assert os.path.isdir(os.path.join(ckpt, "checkpoint-2"))
    with open(tmp_path / "logs" / "train_controlnet_metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    steps = [r["step"] for r in records if "train_loss" in r]
    assert steps == [1, 2, 3]
    assert any("eval_loss" in r for r in records)

    # hint image -> steered sampling via the CLI
    from PIL import Image

    from stable_diffusion_pytorch_tpu.utils.data import edge_hint

    rng = np.random.default_rng(0)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    hint = edge_hint(img.astype(np.float32) / 127.5 - 1.0)
    Image.fromarray(((hint + 1) * 127.5).astype(np.uint8)).save(
        tmp_path / "hint.png"
    )

    from scripts import txt2img

    txt2img.main([
        "--channels-list", "16,32",
        "--n-heads", "4",
        "--time-emb-dim", "32",
        "--n-layers", "1",
        "--autoencoder-channels-list", "8,16",
        "--groups", "4",
        "--noise-steps", "20",
        "--image-size", "16",
        "--sampling-steps", "3",
        "--prompt", "a red circle",
        "--controlnet-checkpoint", ckpt,
        "--control-image", str(tmp_path / "hint.png"),
        "--control-scale", "0.7",
        "--output-dir", str(tmp_path / "out"),
        "--output-name", "cn_roundtrip",
    ])
    assert any("cn_roundtrip" in f for f in os.listdir(tmp_path / "out"))
