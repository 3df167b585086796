"""Long-prompt chunked encoding (beyond the 77-token CLIP window; the
A1111/lpw ecosystem scheme). No reference counterpart — the reference
truncates at 77."""

import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.models.clip import (
    BOS_TOKEN_ID,
    EOS_TOKEN_ID,
    CLIPModel,
    ClipConfig,
)


@pytest.fixture(scope="module")
def clip_model():
    return CLIPModel(ClipConfig(model_dir=None))


LONG = "a detailed painting of " + " and ".join(
    f"object{i}" for i in range(40)
)


def test_short_prompt_single_chunk_matches_tokenize(clip_model):
    ids, w, k = clip_model.tokenize_chunked(["a red cat"])
    assert k == 1 and w is None
    assert ids.shape == (1, 1, 77)
    np.testing.assert_array_equal(
        ids[:, 0], np.asarray(clip_model.tokenize(["a red cat"]).input_ids)
    )


def test_long_prompt_chunks_cover_all_tokens(clip_model):
    body = clip_model._body_ids(LONG)
    assert len(body) > 75, "test prompt must exceed one window"
    ids, w, k = clip_model.tokenize_chunked([LONG])
    assert k == -(-len(body) // 75)
    assert ids.shape == (1, k, 77)
    # every chunk is BOS ... EOS and the bodies concatenate to the original
    recovered = []
    for c in range(k):
        row = list(ids[0, c])
        assert row[0] == BOS_TOKEN_ID
        body_c = [t for t in row[1:] if t != EOS_TOKEN_ID]
        recovered.extend(body_c)
    assert recovered == body


def test_mixed_batch_pads_to_max_chunks(clip_model):
    ids, _, k = clip_model.tokenize_chunked(["short", LONG])
    assert k >= 2 and ids.shape[0] == 2
    # the short prompt's extra chunks are EOS padding rows
    assert all(
        t == EOS_TOKEN_ID for t in ids[0, 1][1:]
    ) and ids[0, 1][0] == BOS_TOKEN_ID


def test_encode_chunked_shape_and_first_window_consistency(clip_model):
    ids, _, k = clip_model.tokenize_chunked([LONG])
    emb = np.asarray(clip_model.encode_text_chunked(ids))
    assert emb.shape == (1, k * 77, 768)
    # chunk 0 encodes exactly like a standalone 77-token sequence
    solo = np.asarray(clip_model.encode_text(ids[:, 0]))
    np.testing.assert_allclose(emb[:, :77], solo, rtol=1e-5, atol=1e-5)


def test_weighted_long_prompt(clip_model):
    weighted_long = LONG + " ((masterpiece:1.4))"
    ids, w, k = clip_model.tokenize_chunked([weighted_long], weighted=True)
    assert w is not None and w.shape == ids.shape
    assert np.isclose(w.max(), 1.4 * 1.1)
    plain_ids, _, k2 = clip_model.tokenize_chunked(
        [LONG + " masterpiece"], weighted=False
    )
    assert k == k2
    np.testing.assert_array_equal(ids, plain_ids)
    emb_w = np.asarray(clip_model.encode_text_chunked(ids, w))
    emb_p = np.asarray(clip_model.encode_text_chunked(plain_ids))
    assert not np.allclose(emb_w, emb_p)


def test_end_to_end_sampling_with_long_prompt():
    """encode_prompts auto-chunks; the sampler runs with kv = K*77 (flash
    masks the arbitrary length on TPU; XLA path here) and a 77-token negative
    prompt is tiled to match. Compat mode keeps the reference's truncation."""
    import jax
    import jax.numpy as jnp

    from stable_diffusion_pytorch_tpu.config import (
        compat_from_cfg,
        load_config,
    )
    from stable_diffusion_pytorch_tpu.models.build import build_models

    argv = [
        "--channels-list", "16,32", "--n-heads", "4", "--time-emb-dim", "32",
        "--n-layers", "1", "--autoencoder-channels-list", "8,16", "--groups", "4",
        "--noise-steps", "20",
    ]
    _, cfg = load_config(argv)
    model = build_models(cfg.model, init_image_size=16)

    ctx = model.encode_prompts([LONG])
    assert ctx.shape[1] > 77 and ctx.shape[1] % 77 == 0

    noise = jax.random.normal(jax.random.PRNGKey(0), model.latent_shape(1, 16))
    out = model.sample(
        noised_sample=noise,
        context_emb=ctx.astype(jnp.float32),
        guidance_scale=7.5,
        time_steps=2,
        sampler="ddim",
        key=jax.random.PRNGKey(0),
        negative_prompt="blurry",
    )
    assert np.isfinite(np.asarray(out)).all()

    _, ccfg = load_config(argv + ["--reference-compat"])
    cmodel = build_models(
        ccfg.model, compat=compat_from_cfg(ccfg), init_image_size=16
    )
    assert cmodel.encode_prompts([LONG]).shape[1] == 77
