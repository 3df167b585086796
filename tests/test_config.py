"""Config-system tests: reference flag-surface parity (SURVEY.md §5 config row)."""

import pytest

from stable_diffusion_pytorch_tpu.config import ConfigNode, load_config


def test_default_group_layout():
    args, cfg = load_config([])
    # reference nesting: parse_args.py:300-308
    for group in ["log", "train", "optim", "dataset", "checkpoint", "model"]:
        assert group in cfg, f"missing group {group}"
    for mgroup in ["unet", "autoencoder", "clip", "ddpm"]:
        assert mgroup in cfg.model, f"missing model group {mgroup}"


def test_reference_defaults():
    _, cfg = load_config([])
    # trainer_args.py:39-88
    assert cfg.train.seed == 42
    assert cfg.train.max_train_steps == 20000
    assert cfg.train.train_batch_size == 8
    assert cfg.train.gradient_accumulation_steps == 4
    assert cfg.train.guidance_scale == 7.5
    assert cfg.optim.learning_rate == 4e-5
    assert cfg.optim.adam_weight_decay == 0.1
    assert cfg.optim.max_grad_norm == 0.1
    assert cfg.optim.lr_warmup_steps == 500
    # unet.py:29-57
    assert cfg.model.unet.num_res_blocks == 2
    assert cfg.model.unet.n_heads == 8
    assert cfg.model.unet.attention_resolutions == [0, 1]
    assert cfg.model.unet.channels_list == [160, 320]
    assert cfg.model.unet.time_emb_dim == 512
    assert cfg.model.unet.context_dim == 768
    # autoencoder.py:22-48
    assert cfg.model.autoencoder.latent_channels == 4
    assert cfg.model.autoencoder.autoencoder_channels_list == [64, 128]
    assert cfg.model.autoencoder.groups == 32
    assert cfg.model.autoencoder.kl_weight == 1.0
    # scheduler.py:9-22
    assert cfg.model.ddpm.noise_steps == 1000
    assert cfg.model.ddpm.beta_start == 1e-4
    assert cfg.model.ddpm.beta_end == 0.02
    # prepare_dataset.py:26-61
    assert cfg.dataset.resolution == 64
    assert cfg.dataset.max_train_samples == 9000
    # checkpointing_args.py:17-37
    assert cfg.checkpoint.ckpt_dir == "model"
    assert cfg.checkpoint.resume_from_checkpoint is None


def test_flag_override_and_list_parsing():
    _, cfg = load_config(
        [
            "--learning-rate", "5e-7",
            "--channels-list", "64,128,256",
            "--max-train-steps", "10000",
            "--noise-schedule", "cosine",
            "--resume-from-checkpoint", "latest",
        ]
    )
    assert cfg.optim.learning_rate == 5e-7
    assert cfg.model.unet.channels_list == [64, 128, 256]
    assert cfg.train.max_train_steps == 10000
    assert cfg.model.ddpm.noise_schedule == "cosine"
    assert cfg.checkpoint.resume_from_checkpoint == "latest"


def test_list_bracket_syntax():
    _, cfg = load_config(["--channels-list", "[32, 64]"])
    assert cfg.model.unet.channels_list == [32, 64]


def test_bool_inversion_semantics():
    """Reference quirk (parse_args.py:188-192): default=True fields are
    store_false flags."""
    _, cfg = load_config([])
    assert cfg.dataset.center_crop is True
    _, cfg = load_config(["--center-crop"])  # the flag DISABLES center_crop
    assert cfg.dataset.center_crop is False
    # default=False fields are normal store_true flags
    _, cfg = load_config(["--random-flip"])
    assert cfg.dataset.random_flip is True


def test_choices_enforced():
    with pytest.raises(SystemExit):
        load_config(["--noise-schedule", "bogus"])


def test_compat_group_present():
    _, cfg = load_config(["--reference-compat"])
    assert cfg.compat.reference_compat is True
    resolved = __import__(
        "stable_diffusion_pytorch_tpu.utils.compat", fromlist=["CompatConfig"]
    ).CompatConfig(**{k: v for k, v in cfg.compat.items()}).resolved()
    assert resolved.cfg_formula and resolved.ascending_sample_loop


def test_confignode_roundtrip():
    node = ConfigNode.from_dict({"a": 1, "b": {"c": [1, 2]}})
    assert node.a == 1 and node.b.c == [1, 2]
    assert node.to_dict() == {"a": 1, "b": {"c": [1, 2]}}


def test_legacy_add_args_surface():
    """The reference's deprecated add_*_args staticmethods exist and parse
    underscore-style flags with the LEGACY defaults (unet.py:110-162,
    scheduler.py:26-50, clip_model.py:31-54, autoencoder.py:53-91,
    model_utils.py:19-26, trainer_args.py:94-164)."""
    import argparse
    import warnings

    from stable_diffusion_pytorch_tpu.models.build import add_model_args
    from stable_diffusion_pytorch_tpu.trainers.args import (
        add_distributed_training_args,
        add_lr_scheduler_args,
        add_optimization_args,
    )

    parser = argparse.ArgumentParser()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        add_model_args(parser)
        add_distributed_training_args(parser)
        add_optimization_args(parser)
        add_lr_scheduler_args(parser)
    args = parser.parse_args(
        ["--n_heads", "2", "--channels_list", "32", "64", "--noise_steps", "10"]
    )
    # legacy underscore flags + nargs='+' lists parse
    assert args.n_heads == 2 and args.channels_list == [32, 64]
    assert args.noise_steps == 10
    # legacy defaults preserved where they differ from the live dataclasses
    assert args.attention_resolutions == [1]  # legacy default, not [0, 1]
    assert args.seed == 0 and args.eval_batch_size == 1  # trainer legacy defaults
    assert args.learning_rate == 1e-4 and args.lr_warmup_steps == 0
    assert args.cache_dir is None and args.type == "linear"
    # live dataclass-derived defaults for the rest
    assert args.latent_channels == 4 and args.groups == 32


def test_convert_dataclass_to_argparse_deprecated_alias():
    import argparse
    import warnings

    from stable_diffusion_pytorch_tpu.config import convert_dataclass_to_argparse
    from stable_diffusion_pytorch_tpu.trainers.args import OptimConfig

    parser = argparse.ArgumentParser()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        convert_dataclass_to_argparse([OptimConfig], parser)
    assert any(issubclass(w.category, DeprecationWarning) for w in caught)
    args = parser.parse_args(["--learning-rate", "3e-4"])
    assert args.learning_rate == 3e-4


def test_config_file_presets_all_load_and_apply():
    """Every shipped preset resolves by bare filename and installs its
    fields as parser defaults (CLI flags still win); the accelerate-config
    analog (SURVEY.md component 20)."""
    import glob
    import os

    from stable_diffusion_pytorch_tpu import config as config_mod
    from stable_diffusion_pytorch_tpu.config import load_config

    preset_dir = os.path.join(
        os.path.dirname(config_mod.__file__), "config_presets"
    )
    names = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(preset_dir, "*.json")))
    assert {"base.json", "zero2.json", "fsdp.json", "perf.json"} <= set(names)
    for name in names:
        args, _ = load_config(["--config-file", name])
        assert args is not None

    # perf preset: measured max-throughput knobs land as defaults...
    args, cfg = load_config(["--config-file", "perf.json"])
    assert args.steps_per_dispatch == 8
    assert args.adam_mu_dtype == "bf16" and args.adam_nu_dtype == "bf16"
    # ...but an explicit CLI flag still overrides the preset
    args, _ = load_config(
        ["--config-file", "perf.json", "--steps-per-dispatch", "1"]
    )
    assert args.steps_per_dispatch == 1


def test_config_file_unknown_key_fails_loudly(tmp_path):
    import json

    import pytest

    from stable_diffusion_pytorch_tpu.config import load_config

    bad = tmp_path / "typo.json"
    bad.write_text(json.dumps({"steps_per_dispatchh": 8}))
    with pytest.raises(SystemExit):
        load_config(["--config-file", str(bad)])
