"""tools/stage_check.py: the one-command stage-readiness drill must actually
run every check when artifacts are staged (round-3 verdict item 8).

Synthetic artifacts at tiny scale exercise the same loaders + converters the
real staged weights will go through, so a green run here means the drill is
ready the day real SD-1.5 / Inception / CLIP weights appear.
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import stage_check  # noqa: E402

from stable_diffusion_pytorch_tpu.models.bpe import bytes_to_unicode  # noqa: E402

MERGES = [("c", "a"), ("ca", "t</w>"), ("t", "h"), ("th", "e</w>"), ("o", "n</w>")]


def _stage_tokenizer(model_dir):
    d = os.path.join(model_dir, "tokenizer")
    os.makedirs(d)
    base = list(bytes_to_unicode().values())
    vocab = {tok: i for i, tok in enumerate(base)}
    vocab.update({tok + "</w>": 256 + i for i, tok in enumerate(base)})
    for i, (a, b) in enumerate(MERGES):
        vocab[a + b] = 512 + i
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")


def _stage_text_encoder(model_dir):
    from safetensors.torch import save_file
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = dict(vocab_size=100, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=64,
               max_position_embeddings=16)
    torch.manual_seed(0)
    hf = CLIPTextModel(CLIPTextConfig(**cfg)).eval()
    d = os.path.join(model_dir, "text_encoder")
    os.makedirs(d)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"num_attention_heads": cfg["num_attention_heads"]}, f)


def _stage_vae(model_dir):
    """Diffusers-format dir via the test-local torch replica in
    test_diffusers_vae (state-dict naming matches diffusers)."""
    from safetensors.torch import save_file

    import test_diffusers_vae as tdv

    torch.manual_seed(1)
    tvae = tdv.TorchVAE().eval()
    d = os.path.join(model_dir, "vae")
    os.makedirs(d)
    save_file({k: v.contiguous() for k, v in tvae.state_dict().items()},
              os.path.join(d, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"block_out_channels": [8, 16], "layers_per_block": 2,
                   "norm_num_groups": 4, "latent_channels": 4}, f)


def _stage_unet(model_dir):
    """Reference-format unet.pt from the actual /root/reference torch model
    (tiny config pinned by the unet_config.json sidecar)."""
    from types import SimpleNamespace

    sys.path.append("/root/reference")
    import stable_diffusion.models.utils  # noqa: F401 (circular import)
    from stable_diffusion.models.unet import UNetModel as RefUNet

    kwargs = dict(num_res_blocks=1, n_heads=2, attention_resolutions=[1],
                  channels_list=[8, 16], time_emb_dim=16, dropout=0.0,
                  n_layers=1, context_dim=24)
    torch.manual_seed(2)
    ref = RefUNet(4, 4, SimpleNamespace(**kwargs)).eval()
    torch.save(ref.state_dict(), os.path.join(model_dir, "unet.pt"))
    with open(os.path.join(model_dir, "unet_config.json"), "w") as f:
        json.dump(kwargs, f)


def _stage_inception(model_dir):
    import test_inception as ti
    import torch.nn as tnn

    torch.manual_seed(3)
    model = ti.TorchInceptionPool3()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                tnn.init.kaiming_normal_(m.weight, nonlinearity="relu")
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    d = os.path.join(model_dir, "inception")
    os.makedirs(d)
    torch.save(model.state_dict(), os.path.join(d, "inception_v3.pth"))


def _stage_clip_full(model_dir):
    """Full-CLIP state dict with HF CLIPModel key naming at tiny scale."""
    from safetensors.torch import save_file
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(4)
    cfg = CLIPConfig(
        text_config={"vocab_size": 600, "hidden_size": 32,
                     "num_hidden_layers": 2, "num_attention_heads": 4,
                     "intermediate_size": 64, "max_position_embeddings": 77},
        vision_config={"hidden_size": 48, "num_hidden_layers": 2,
                       "num_attention_heads": 4, "intermediate_size": 96,
                       "image_size": 32, "patch_size": 16},
        projection_dim=64,
    )
    hf = CLIPModel(cfg).eval()
    d = os.path.join(model_dir, "clip_full")
    os.makedirs(d)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"text_config": {"num_attention_heads": 4},
                   "vision_config": {"num_attention_heads": 4}}, f)


@pytest.fixture(scope="module")
def staged_dir(tmp_path_factory):
    model_dir = str(tmp_path_factory.mktemp("staged"))
    _stage_tokenizer(model_dir)
    _stage_text_encoder(model_dir)
    _stage_vae(model_dir)
    _stage_unet(model_dir)
    _stage_inception(model_dir)
    _stage_clip_full(model_dir)
    return model_dir


def test_all_missing_reports_every_artifact(tmp_path, capsys):
    with pytest.raises(SystemExit) as exc:
        stage_check.main(["--model-dir", str(tmp_path)])
    assert exc.value.code == 2  # missing, not failed
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(report["missing"]) == sorted(stage_check.CHECKS)
    assert report["failed"] == []
    for r in report["checks"].values():
        assert "stage" in r  # tells the operator exactly what to put where


def test_staged_artifacts_all_pass(staged_dir, capsys):
    out = stage_check.main(["--model-dir", staged_dir])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["missing"] == [] and report["failed"] == [], report["checks"]
    checks = report["checks"]
    # the discriminating modes actually ran (not load-only fallbacks)
    assert checks["tokenizer"]["mode"] == "hf-parity"
    assert checks["text_encoder"]["mode"] == "torch-parity"
    assert checks["text_encoder"]["max_abs_delta"] <= 1e-3
    assert checks["vae"]["mode"] == "diffusers-parity" or checks["vae"][
        "mode"].startswith("load-only")
    assert checks["unet"]["mode"] == "torch-parity"
    assert checks["unet"]["max_abs_delta"] <= 1e-3
    assert checks["clip_vision"]["pretrained"] is True


def test_single_failure_exits_1(staged_dir, tmp_path, capsys):
    """A staged-but-corrupt artifact must FAIL (exit 1), not pass silently."""
    import shutil

    bad = tmp_path / "bad"
    bad.mkdir()
    shutil.copytree(os.path.join(staged_dir, "text_encoder"),
                    bad / "text_encoder")
    # corrupt: truncate the safetensors file
    st = bad / "text_encoder" / "model.safetensors"
    st.write_bytes(st.read_bytes()[: len(st.read_bytes()) // 2])
    with pytest.raises(SystemExit) as exc:
        stage_check.main(["--model-dir", str(bad), "--only", "text_encoder"])
    assert exc.value.code == 1
