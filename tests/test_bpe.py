"""CLIP BPE tokenizer: HF token-for-token parity + offline fallback semantics.

The real vocab/merges cannot be fetched offline, so HF parity is proven on a
synthetic vocab/merges pair loaded by BOTH implementations — this exercises the
byte-to-unicode map, the ranked merge loop, the splitting regex, truncation,
BOS/EOS and EOS-padding exactly as a staged real vocab would.
"""

import json

import numpy as np
import pytest

from stable_diffusion_pytorch_tpu.models.bpe import (
    BOS_TOKEN_ID,
    EOS_TOKEN_ID,
    CLIPBPETokenizer,
    bytes_to_unicode,
)

MERGES = [
    ("r", "e"),
    ("re", "d</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("t", "h"),
    ("th", "e</w>"),
    ("o", "n</w>"),
]


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    base = list(bytes_to_unicode().values())
    vocab = {tok: i for i, tok in enumerate(base)}
    vocab.update({tok + "</w>": 256 + i for i, tok in enumerate(base)})
    for i, (a, b) in enumerate(MERGES):
        vocab[a + b] = 512 + i
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n"
    )
    return str(d)


PROMPTS = [
    "the red cat",
    "a red cat on a gradient background",
    "Hello, World!",  # case folding + punctuation
    "the    red\n cat",  # whitespace cleanup
    "cathedral reduce",  # merges inside longer words ('ca','t h','re'...)
    "a " * 100,  # truncation
    "",
]


def test_hf_token_for_token_parity(vocab_dir):
    from transformers import CLIPTokenizer

    hf = CLIPTokenizer(
        vocab_file=vocab_dir + "/vocab.json",
        merges_file=vocab_dir + "/merges.txt",
        model_max_length=77,
    )
    ours = CLIPBPETokenizer.from_dir(vocab_dir)
    assert ours.pretrained
    for prompt in PROMPTS:
        theirs = hf(
            [prompt], max_length=77, padding="max_length", truncation=True
        ).input_ids
        got = ours([prompt], max_length=77, padding="max_length", truncation=True)
        np.testing.assert_array_equal(
            np.asarray(got.input_ids), np.asarray(theirs), err_msg=f"prompt={prompt!r}"
        )


def test_offline_fallback_ids_are_real_clip_byte_ids():
    """Zero-merge fallback: ids 0-255 are the byte symbols and 256-511 the
    byte</w> symbols — the exact layout of the published CLIP vocab."""
    tok = CLIPBPETokenizer()
    assert not tok.pretrained
    ids = tok(["cat"]).input_ids[0]
    # 'c'->99-33=66, 'a'->64, 't</w>'->256+(116-33)=339 in bytes_to_unicode order
    assert ids[0] == BOS_TOKEN_ID
    assert list(ids[1:4]) == [66, 64, 339]
    assert ids[4] == EOS_TOKEN_ID
    assert all(i == EOS_TOKEN_ID for i in ids[4:])
    assert len(ids) == 77


def test_merge_order_respected(vocab_dir):
    tok = CLIPBPETokenizer.from_dir(vocab_dir)
    # 'red' -> r+e merges first (rank 0), then re+d</w> (rank 1) -> one token
    assert tok.bpe("red") == "red</w>"
    # 'ret': r+e merges, d</w> merge doesn't apply -> 're' 't</w>'
    assert tok.bpe("ret") == "re t</w>"
    # 'the' -> t+h then th+e</w>
    assert tok.bpe("the") == "the</w>"


def test_truncation_keeps_terminal_eos():
    tok = CLIPBPETokenizer()
    ids = tok(["a " * 200], max_length=10).input_ids[0]
    assert len(ids) == 10
    assert ids[0] == BOS_TOKEN_ID and ids[-1] == EOS_TOKEN_ID


def test_decode_roundtrip_ascii():
    tok = CLIPBPETokenizer()
    ids = tok(["a red cat"]).input_ids[0]
    assert tok.decode(ids) == "a red cat"


def test_clip_model_uses_bpe_fallback(tmp_path):
    """CLIPModel's offline default tokenizer is the BPE fallback, not a hash."""
    from stable_diffusion_pytorch_tpu.models.clip import CLIPModel, ClipConfig

    model = CLIPModel(ClipConfig(model_dir=str(tmp_path)))
    assert isinstance(model.tokenizer, CLIPBPETokenizer)
    out = model.tokenize(["a red cat"])
    assert out.input_ids.shape == (1, 77)
    assert out.input_ids[0, 0] == BOS_TOKEN_ID
