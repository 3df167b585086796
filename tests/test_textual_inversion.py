"""Textual inversion (Gal et al. 2022): placeholder tokenization, embedding
injection, train step, and e2e trainer. No reference counterpart — capability
beyond /root/reference (ecosystem analog: diffusers textual_inversion.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.models.clip import (
    BOS_TOKEN_ID,
    EOS_TOKEN_ID,
    VOCAB_SIZE,
    CLIPModel,
    CLIPTextTransformer,
    ClipConfig,
)


@pytest.fixture(scope="module")
def clip_model():
    return CLIPModel(ClipConfig(model_dir=None))


def test_placeholder_tokenize_expands_to_sentinels(clip_model):
    m = clip_model
    sentinels = m.add_textual_inversion("<thing>", np.zeros((2, 768), np.float32))
    try:
        assert list(sentinels) == [VOCAB_SIZE, VOCAB_SIZE + 1]
        ids = np.asarray(m.tokenize(["a photo of a <thing>"]).input_ids)[0]
        assert ids.shape == (77,)
        assert ids[0] == BOS_TOKEN_ID
        # the sentinel pair appears contiguously, exactly once
        pos = np.where(ids == VOCAB_SIZE)[0]
        assert len(pos) == 1
        p = int(pos[0])
        assert ids[p + 1] == VOCAB_SIZE + 1
        # EOS terminates and pads the row
        body_end = p + 2
        assert EOS_TOKEN_ID in ids[body_end:]
        # the surrounding words tokenize identically to the plain path
        plain = m._plain_ids("a photo of a")
        assert list(ids[1 : 1 + len(plain)]) == plain
    finally:
        m._ti = None


def test_placeholder_tokenize_multiple_occurrences_and_truncation(clip_model):
    m = clip_model
    m.add_textual_inversion("<c>", np.zeros((1, 768), np.float32))
    try:
        ids = np.asarray(m.tokenize(["<c> next to a <c>"]).input_ids)[0]
        assert int((ids == VOCAB_SIZE).sum()) == 2
        # a monster prompt still fits 77 with terminal EOS
        ids = np.asarray(m.tokenize(["word " * 200 + "<c>"]).input_ids)[0]
        assert ids.shape == (77,)
        assert ids[-1] == EOS_TOKEN_ID
    finally:
        m._ti = None


def test_injection_matches_real_token_embedding():
    """Overriding a sentinel with the embedding row of a REAL token must give
    bit-identical encodings to using that token directly — the injection is
    exactly a token-embedding substitution."""
    key = jax.random.PRNGKey(0)
    tower = CLIPTextTransformer(d_model=32, n_layers=2, n_heads=4, intermediate=64)
    ids = jnp.array([[BOS_TOKEN_ID, 11, 22, 33, EOS_TOKEN_ID, 0, 0, 0]], jnp.int32)
    params = tower.init(key, ids)

    table = params["params"]["token_embedding"]["embedding"]
    sentinel = jnp.array([VOCAB_SIZE], jnp.int32)
    ids_with_sentinel = ids.at[0, 2].set(VOCAB_SIZE)

    ref = tower.apply(params, ids)
    inj = tower.apply(
        params, ids_with_sentinel, token_overrides=(sentinel, table[22:23])
    )
    np.testing.assert_allclose(np.asarray(inj), np.asarray(ref), atol=1e-6)


def test_injection_is_differentiable_in_vectors():
    key = jax.random.PRNGKey(1)
    tower = CLIPTextTransformer(d_model=32, n_layers=1, n_heads=4, intermediate=64)
    ids = jnp.array([[BOS_TOKEN_ID, VOCAB_SIZE, EOS_TOKEN_ID, 0]], jnp.int32)
    params = tower.init(key, jnp.zeros_like(ids))
    sentinel = jnp.array([VOCAB_SIZE], jnp.int32)

    def loss(vec):
        out = tower.apply(params, ids, token_overrides=(sentinel, vec))
        return jnp.sum(out**2)

    g = jax.grad(loss)(jnp.ones((1, 32), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_ti_train_step_updates_only_vectors():
    from stable_diffusion_pytorch_tpu.models.autoencoder import (
        AutoEncoderKL,
        AutoencoderConfig,
    )
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
    from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig
    from stable_diffusion_pytorch_tpu.trainers.steps import (
        TrainState,
        make_textual_inversion_train_step,
    )

    key = jax.random.PRNGKey(0)
    unet = UNetModel.from_config(
        4, 8, UnetConfig(channels_list=[16, 32], n_heads=4, time_emb_dim=32, n_layers=1)
    )
    vae = AutoEncoderKL.from_config(
        AutoencoderConfig(autoencoder_channels_list=[8, 16], groups=4)
    )
    clip = CLIPTextTransformer(d_model=768, n_layers=1, n_heads=4, intermediate=64)

    img = jax.random.normal(key, (2, 16, 16, 3))
    pids = np.array([VOCAB_SIZE], np.int32)
    ids = jnp.full((2, 8), EOS_TOKEN_ID, jnp.int32)
    ids = ids.at[:, 0].set(BOS_TOKEN_ID).at[:, 1].set(VOCAB_SIZE)

    unet_params = unet.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 768))
    )
    # a FROZEN init-state UNet passes zero gradient to context (zero-init
    # proj_out); perturb it off init like a pretrained UNet would be
    leaves, treedef = jax.tree_util.tree_flatten(unet_params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    unet_params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )
    vae_params = vae.init(key, img[:1])
    clip_params = clip.init(key, jnp.zeros_like(ids[:1]))

    import optax

    tx = optax.adam(1e-2)
    sched = make_schedule(DDPMConfig(noise_steps=20))
    train_step, eval_step = make_textual_inversion_train_step(
        unet, clip, vae, sched, tx, placeholder_ids=pids
    )
    jit_step = jax.jit(train_step)

    state = TrainState.create({"ti": jnp.zeros((1, 768), jnp.float32)}, tx)
    batch = {"pixel_values": img, "input_ids": ids}
    losses = []
    for _ in range(8):
        state, metrics = jit_step(
            state, unet_params, clip_params, vae_params, batch, key
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not descend: {losses}"
    # the trainable state is ONLY the vectors, and they moved
    assert list(state.params.keys()) == ["ti"]
    assert float(jnp.abs(state.params["ti"]).sum()) > 0
    ev = eval_step(state.params, unet_params, clip_params, vae_params, batch, key)
    assert np.isfinite(float(ev))


def test_train_textual_inversion_e2e(tmp_path, monkeypatch):
    """The CLI entry point end-to-end on the virtual mesh: trains, evals,
    writes the sidecar, logs metrics."""
    monkeypatch.chdir(tmp_path)
    import train_textual_inversion

    ckpt = str(tmp_path / "ckpt")
    train_textual_inversion.main([
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
        "--max-train-steps", "3",
        "--log-interval", "2",
        # chain coverage for TextualInversionTrainer._chain_args (frozen
        # unet/clip/vae passed as pre-args): steps 1-2 run as one chunk,
        # step 3 per-step; eval/ckpt assertions below validate boundaries
        "--steps-per-dispatch", "2",
        "--placeholder-token", "<thing>",
        "--num-vectors", "2",
        "--ckpt-dir", ckpt,
        "--checkpointing-steps", "2",
        "--logging-dir", str(tmp_path / "logs"),
    ])
    with open(os.path.join(ckpt, "textual_inversion.json")) as f:
        sidecar = json.load(f)
    assert sidecar == {"placeholder_token": "<thing>", "num_vectors": 2}
    assert os.path.isdir(os.path.join(ckpt, "checkpoint-2"))
    with open(tmp_path / "logs" / "train_textual_inversion_metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    steps = [r["step"] for r in records if "train_loss" in r]
    assert steps == [1, 2, 3]
    assert any("eval_loss" in r for r in records)

    # round-trip: sample with the learned placeholder via the txt2img CLI
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
        "--sampling-steps", "4",
        "--prompt", "a photo of a <thing>",
        "--textual-inversion", ckpt,
        "--output-dir", str(tmp_path / "out"),
        "--output-name", "ti_roundtrip",
    ])
    outs = os.listdir(tmp_path / "out")
    assert any("ti_roundtrip" in f for f in outs), outs


def test_initializer_token_vectors(clip_model):
    from train_textual_inversion import init_concept_vectors

    class TrainCfg:
        num_vectors = 3
        initializer_token = "cat"

    v = init_concept_vectors(clip_model, TrainCfg())
    assert v.shape == (3, 768)
    table = np.asarray(
        clip_model.params["params"]["token_embedding"]["embedding"]
    )
    ids = clip_model._plain_ids("cat")
    expected = table[ids].mean(axis=0)
    np.testing.assert_allclose(v[0], expected, rtol=1e-6)
    np.testing.assert_allclose(v[1], v[0])

    class RandCfg:
        num_vectors = 2
        initializer_token = ""

    r = init_concept_vectors(clip_model, RandCfg(), seed=0)
    assert r.shape == (2, 768)
    assert not np.allclose(r[0], r[1])
