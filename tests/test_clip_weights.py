"""CLIP weight porting: HF torch checkpoint -> our Flax params, validated
token-by-token (SURVEY.md §7 'hard parts')."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from stable_diffusion_pytorch_tpu.models.clip import (  # noqa: E402
    CLIPTextTransformer,
    load_clip_params,
)

TINY = dict(
    vocab_size=100,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=16,
)


@pytest.fixture(scope="module")
def tiny_pair(tmp_path_factory):
    from transformers import CLIPTextConfig, CLIPTextModel

    torch.manual_seed(0)
    hf_cfg = CLIPTextConfig(**TINY)
    hf_model = CLIPTextModel(hf_cfg).eval()

    tmp = tmp_path_factory.mktemp("clip_ckpt")
    te_dir = os.path.join(str(tmp), "text_encoder")
    os.makedirs(te_dir)
    try:
        from safetensors.torch import save_file

        save_file(
            {k: v.contiguous() for k, v in hf_model.state_dict().items()},
            os.path.join(te_dir, "model.safetensors"),
        )
    except ImportError:
        torch.save(hf_model.state_dict(), os.path.join(te_dir, "pytorch_model.bin"))

    params = load_clip_params(str(tmp))
    assert params is not None
    ours = CLIPTextTransformer(
        vocab_size=TINY["vocab_size"],
        d_model=TINY["hidden_size"],
        n_layers=TINY["num_hidden_layers"],
        n_heads=TINY["num_attention_heads"],
        intermediate=TINY["intermediate_size"],
        max_positions=TINY["max_position_embeddings"],
    )
    return hf_model, ours, params


def test_converted_weights_match_hf_outputs(tiny_pair):
    hf_model, ours, params = tiny_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY["vocab_size"], size=(3, 16)).astype(np.int32)

    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(ids.astype(np.int64))).last_hidden_state

    out = ours.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(out), theirs.numpy(), rtol=1e-4, atol=1e-4
    )


def test_loader_returns_none_when_absent(tmp_path):
    assert load_clip_params(str(tmp_path)) is None
