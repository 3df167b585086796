#!/usr/bin/env python
"""Textual-inversion training entry point (Gal et al. 2022, "An Image is
Worth One Word").

No counterpart in /root/reference — capability extension; the ecosystem analog
is diffusers' textual_inversion.py. Everything is frozen (UNet, VAE, the whole
CLIP tower) except K learned embedding vectors for a placeholder token; the
checkpoint is KB-sized and the learned concept is usable from ``sample`` via
``CLIPModel.add_textual_inversion``.

Example (tiny smoke run, CPU):
    JAX_PLATFORMS=cpu python train_textual_inversion.py --dataset synthetic \
        --max-train-steps 3 --train-batch-size 2 --placeholder-token "<thing>" \
        --num-vectors 2 --channels-list 32,64 --n-heads 4 --time-emb-dim 64 \
        --n-layers 1 --autoencoder-channels-list 16,32 --groups 8 \
        --ckpt-dir /tmp/ti_ckpt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def init_concept_vectors(text_encoder, cfg_train, seed: int = 0):
    """Build the [K, 768] initial vectors: copies of the initializer token's
    embedding row when ``--initializer-token`` is given (the paper's coarse
    semantic prior), else small gaussian noise."""
    import numpy as np

    d_model = text_encoder.module.d_model
    k = cfg_train.num_vectors
    if cfg_train.initializer_token:
        table = np.asarray(
            text_encoder.params["params"]["token_embedding"]["embedding"]
        )
        ids = text_encoder._plain_ids(cfg_train.initializer_token)
        assert ids, f"initializer token {cfg_train.initializer_token!r} tokenized to nothing"
        row = table[ids].mean(axis=0)  # multi-token initializers: mean embedding
        return np.tile(row[None, :], (k, 1)).astype(np.float32)
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((k, d_model)) * 0.02).astype(np.float32)


def _main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.platform import (
        enable_compilation_cache,
        ensure_platform,
    )

    ensure_platform()
    enable_compilation_cache()

    from stable_diffusion_pytorch_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()

    from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config
    from stable_diffusion_pytorch_tpu.models.build import build_models, resolve_dtype
    from stable_diffusion_pytorch_tpu.trainers.trainer import TextualInversionTrainer
    from stable_diffusion_pytorch_tpu.utils.data import (
        TextualInversionDataset,
        get_dataset,
    )
    from stable_diffusion_pytorch_tpu.utils.tracking import get_logger

    logger = get_logger("train_textual_inversion")
    args, cfg = load_config(argv)
    compat = compat_from_cfg(cfg)

    dtype = resolve_dtype(cfg.parallel.mixed_precision)
    model = build_models(
        cfg.model, logger=logger, compat=compat, dtype=dtype, seed=cfg.train.seed,
        init_image_size=cfg.dataset.resolution,
        remat=cfg.parallel.remat_policy,
    )
    te = model.text_encoder

    vectors = init_concept_vectors(te, cfg.train, seed=cfg.train.seed)
    te.add_textual_inversion(cfg.train.placeholder_token, vectors)
    logger.info(
        f"textual inversion: placeholder {cfg.train.placeholder_token!r} -> "
        f"{cfg.train.num_vectors} vector(s)"
        + (
            f", initialized from {cfg.train.initializer_token!r}"
            if cfg.train.initializer_token
            else ", random init"
        )
    )

    # pixels come from the configured dataset; every caption is replaced by a
    # TI template containing the placeholder, tokenized through the TI-aware
    # CLIPModel.tokenize (placeholder -> sentinel ids)
    base_train = get_dataset(
        cfg.dataset, split="train", tokenizer=te.tokenizer, logger=logger
    )
    base_eval = get_dataset(
        cfg.dataset, split="validation", tokenizer=te.tokenizer, logger=logger
    )
    train_dataset = TextualInversionDataset(
        base_train, cfg.train.placeholder_token, te.tokenize
    )
    eval_dataset = TextualInversionDataset(
        base_eval, cfg.train.placeholder_token, te.tokenize
    )

    trainer = TextualInversionTrainer(
        model, cfg, train_dataset, eval_dataset, logger=logger
    )
    trainer.train()


def main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.errors import record

    return record(_main)(argv)


if __name__ == "__main__":
    main()
