"""Weighted-prompt syntax: parser and embedding-application semantics.
No reference counterpart (ecosystem-convention capability extension)."""

import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.models.prompt_weighting import (
    has_weight_syntax,
    parse_weighted_prompt,
    plain_text,
)


def test_parse_plain():
    assert parse_weighted_prompt("a cat") == [("a cat", 1.0)]


def test_parse_emphasis_and_deemphasis():
    out = parse_weighted_prompt("a (red) cat [in fog]")
    assert out == [
        ("a ", 1.0),
        ("red", pytest.approx(1.1)),
        (" cat ", 1.0),
        ("in fog", pytest.approx(1 / 1.1)),
    ]


def test_parse_nesting_multiplies():
    out = parse_weighted_prompt("((very)) good")
    assert out[0] == ("very", pytest.approx(1.21))
    out = parse_weighted_prompt("([odd])")
    assert out[0] == ("odd", pytest.approx(1.1 / 1.1))


def test_parse_explicit_weight():
    out = parse_weighted_prompt("a (red:1.5) cat")
    assert out == [("a ", 1.0), ("red", 1.5), (" cat", 1.0)]
    # explicit weight applies to its own group only; outer paren still x1.1
    out = parse_weighted_prompt("((red:2))")
    assert out[0] == ("red", pytest.approx(2 * 1.1))


def test_parse_escapes_and_unbalanced():
    assert parse_weighted_prompt(r"a \(literal\) cat") == [("a (literal) cat", 1.0)]
    # unbalanced closer is literal
    assert parse_weighted_prompt("a ) cat") == [("a ) cat", 1.0)]
    # unbalanced opener applies to the rest
    out = parse_weighted_prompt("a (cat")
    assert out == [("a ", 1.0), ("cat", pytest.approx(1.1))]
    # mismatched pair: ']' can't close '(' -> literal bracket
    out = parse_weighted_prompt("a (cat] dog")
    assert ("cat] dog", pytest.approx(1.1)) == out[1]


def test_parse_colon_outside_group_is_literal():
    assert parse_weighted_prompt("time: 12") == [("time: 12", 1.0)]


def test_has_weight_syntax_and_plain_text():
    assert has_weight_syntax("a (red) cat")
    assert not has_weight_syntax("a red cat")
    assert not has_weight_syntax(r"a \(red\) cat")
    assert plain_text("a ((red:1.3)) cat [x]") == "a red cat x"


@pytest.fixture(scope="module")
def clip_model():
    from stable_diffusion_pytorch_tpu.models.clip import ClipConfig, CLIPModel

    return CLIPModel(ClipConfig(model_dir=None))


def test_tokenize_weighted_aligns_weights(clip_model):
    from stable_diffusion_pytorch_tpu.models.clip import BOS_TOKEN_ID

    out, w = clip_model.tokenize_weighted(["a (red:2.0) cat"])
    ids = np.asarray(out.input_ids)
    assert ids.shape == w.shape == (1, 77)
    assert ids[0, 0] == BOS_TOKEN_ID and w[0, 0] == 1.0
    # the ids must equal the plain tokenization of the cleaned prompt
    plain = np.asarray(clip_model.tokenize(["a red cat"]).input_ids)
    np.testing.assert_array_equal(ids, plain)
    # exactly the 'red' fragment's tokens carry weight 2
    n_red = len(clip_model._plain_ids("red"))
    n_a = len(clip_model._plain_ids("a "))
    assert (w[0] == 2.0).sum() == n_red
    np.testing.assert_allclose(w[0, 1 + n_a : 1 + n_a + n_red], 2.0)


def test_weighted_encode_changes_embedding_preserves_scale(clip_model):
    out, w = clip_model.tokenize_weighted(["a (red:1.8) cat"])
    base = np.asarray(clip_model.encode_text(out.input_ids), np.float32)
    weighted = np.asarray(
        clip_model.encode_text(out.input_ids, token_weights=w), np.float32
    )
    assert not np.allclose(base, weighted)
    # "original mean" rescale: overall magnitude preserved
    np.testing.assert_allclose(
        np.abs(weighted).mean(), np.abs(base).mean(), rtol=1e-5
    )
    # all-ones weights are an exact no-op
    same = np.asarray(
        clip_model.encode_text(out.input_ids, token_weights=np.ones_like(w)),
        np.float32,
    )
    np.testing.assert_allclose(same, base, rtol=1e-5)


def test_encode_prompts_autodetect_and_compat_gate():
    """LatentDiffusion.encode_prompts: weighting auto-detects syntax; in
    reference-compat mode the brackets stay literal."""
    from stable_diffusion_pytorch_tpu.config import load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models

    argv = [
        "--channels-list", "16,32", "--n-heads", "4", "--time-emb-dim", "32",
        "--n-layers", "1", "--autoencoder-channels-list", "8,16", "--groups", "4",
        "--noise-steps", "20",
    ]
    _, cfg = load_config(argv)
    model = build_models(cfg.model, init_image_size=16)

    plain = np.asarray(model.encode_prompts(["a red cat"]))
    emphasized = np.asarray(model.encode_prompts(["a (red:1.8) cat"]))
    literal = np.asarray(model.encode_prompts(["a (red:1.8) cat"], weighted=False))
    # weighted path encodes the CLEANED prompt, scaled -> differs from both
    assert not np.allclose(emphasized, literal)
    assert not np.allclose(emphasized, plain)

    from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config as lc

    _, ccfg = lc(argv + ["--reference-compat"])
    cmodel = build_models(
        ccfg.model, compat=compat_from_cfg(ccfg), init_image_size=16
    )
    compat_enc = np.asarray(cmodel.encode_prompts(["a (red:1.8) cat"]))
    compat_literal = np.asarray(
        cmodel.encode_prompts(["a (red:1.8) cat"], weighted=False)
    )
    np.testing.assert_allclose(compat_enc, compat_literal)
