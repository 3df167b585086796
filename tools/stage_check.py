#!/usr/bin/env python
"""One-command stage-readiness drill (round-3 verdict item 8).

The environment is zero-egress, so real SD-1.5 / Inception / CLIP weights
cannot be downloaded here — but every loader+converter is built and
parity-tested on synthetic checkpoints. The day weights are staged under
``data/pretrained/``, this command closes the north-star FID/parity clause:

    python tools/stage_check.py [--model-dir data/pretrained]

Per artifact it either RUNS the real check or reports exactly what to stage:

  tokenizer      tokenizer/{vocab.json,merges.txt}       -> real-vocab BPE
                 parity vs HF CLIPTokenizer on a probe corpus
  text_encoder   text_encoder/model.safetensors (HF CLIPTextModel state
                 dict) -> convert + token-by-token parity vs torch forward
  vae            vae/ (diffusers AutoencoderKL directory: config.json +
                 diffusion_pytorch_model.safetensors) -> load + encode/
                 decode round-trip finite-ness + (if diffusers importable)
                 output parity vs the torch diffusers VAE
  unet           unet.pt (reference-format torch checkpoint,
                 /root/reference state-dict naming) -> convert + forward
                 parity vs the reference torch UNet
  inception      inception/inception_v3.{npz,safetensors,pth} -> canonical
                 FID pipeline smoke (identical-set FID at the floor,
                 shifted-set FID separated)
  clip_vision    clip_full/model.safetensors (HF CLIPModel, for CLIP
                 score) -> load + image/text tower forward

Prints ONE JSON line {artifact: {status: ok|missing|failed, ...}} and a
human summary on stderr. Exit 0 = everything staged passed; 2 = nothing
failed but artifacts are missing; 1 = a staged artifact FAILED its check.
"""

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.append("/root/reference")  # append: never shadow repo-root modules

PROBE_SENTENCES = [
    "a photograph of an astronaut riding a horse",
    "A majestic lion jumping from a big stone at night, 4k, trending",
    "Hello, World! Ça va? naïve café — emoji 🌊 test",
    "",
    "x" * 300,
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def check_tokenizer(model_dir: str) -> dict:
    vocab = os.path.join(model_dir, "tokenizer", "vocab.json")
    merges = os.path.join(model_dir, "tokenizer", "merges.txt")
    if not (os.path.exists(vocab) and os.path.exists(merges)):
        return {"status": "missing",
                "stage": "tokenizer/{vocab.json,merges.txt} (HF CLIPTokenizer files)"}
    from stable_diffusion_pytorch_tpu.models.bpe import CLIPBPETokenizer

    ours = CLIPBPETokenizer.from_dir(os.path.join(model_dir, "tokenizer"))
    try:
        from transformers import CLIPTokenizer

        hf = CLIPTokenizer(vocab_file=vocab, merges_file=merges)
    except Exception:  # transformers missing/offline-incompatible
        ids = ours(PROBE_SENTENCES, padding="max_length").input_ids
        return {"status": "ok", "mode": "self-only (transformers unavailable)",
                "shape": list(ids.shape)}
    mismatches = []
    for s in PROBE_SENTENCES:
        a = ours([s], max_length=77, padding="max_length",
                 truncation=True).input_ids[0]
        b = hf(s, max_length=77, padding="max_length",
               truncation=True)["input_ids"]
        if list(a) != list(b):
            mismatches.append(s[:40])
    if mismatches:
        return {"status": "failed", "mode": "hf-parity",
                "mismatched_sentences": mismatches}
    return {"status": "ok", "mode": "hf-parity",
            "sentences_checked": len(PROBE_SENTENCES)}


def check_text_encoder(model_dir: str) -> dict:
    import numpy as np

    te_dir = os.path.join(model_dir, "text_encoder")
    has = any(
        os.path.exists(os.path.join(te_dir, f))
        for f in ("model.safetensors", "pytorch_model.bin")
    )
    if not has:
        return {"status": "missing",
                "stage": "text_encoder/model.safetensors (HF CLIPTextModel state dict)"}

    from stable_diffusion_pytorch_tpu.models.clip import (
        CLIPTextTransformer,
        load_clip_params,
    )

    params = load_clip_params(model_dir)
    if params is None:
        return {"status": "failed", "error": "loader returned None for staged files"}
    import jax.numpy as jnp

    emb = params["params"]["token_embedding"]["embedding"]
    vocab_size, d_model = (int(s) for s in emb.shape)
    n_layers = sum(1 for k in params["params"] if k.startswith("layer_"))
    max_pos = int(params["params"]["position_embedding"].shape[0])
    # the head count is not derivable from the weights: read the HF
    # config.json staged next to the state dict (standard HF layout); SD-1.5
    # defaults otherwise
    hf_conf_path = os.path.join(te_dir, "config.json")
    heads = None
    if os.path.exists(hf_conf_path):
        with open(hf_conf_path) as f:
            heads = json.load(f).get("num_attention_heads")
    if heads is None:
        heads = 12 if d_model % 12 == 0 else 8
    tower_kwargs = dict(vocab_size=vocab_size, d_model=d_model,
                        n_layers=n_layers, n_heads=int(heads),
                        max_positions=max_pos)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab_size, (2, max_pos)).astype(np.int32)
    try:
        inter = int(params["params"]["layer_0"]["fc1"]["kernel"].shape[1])
        tower_kwargs["intermediate"] = inter
    except KeyError:
        inter = None
    tower = CLIPTextTransformer(**tower_kwargs)
    ours = np.asarray(tower.apply(params, jnp.asarray(ids)))
    if not np.all(np.isfinite(ours)):
        return {"status": "failed", "error": "non-finite hidden states"}
    # cross-framework parity when torch+transformers can rebuild the model
    try:
        import torch
        from safetensors.torch import load_file
        from transformers import CLIPTextConfig, CLIPTextModel

        st_path = os.path.join(te_dir, "model.safetensors")
        state = (load_file(st_path) if os.path.exists(st_path)
                 else torch.load(os.path.join(te_dir, "pytorch_model.bin"),
                                 map_location="cpu", weights_only=True))
        state = {k.removeprefix("text_model."): v for k, v in state.items()}
        hf_cfg = CLIPTextConfig(
            vocab_size=vocab_size, hidden_size=d_model,
            num_hidden_layers=n_layers, num_attention_heads=int(heads),
            intermediate_size=inter or 4 * d_model,
            max_position_embeddings=max_pos,
        )
        hf = CLIPTextModel(hf_cfg).eval()
        hf.text_model.load_state_dict(state, strict=False)
        with torch.no_grad():
            theirs = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
        delta = float(np.max(np.abs(ours - theirs)))
        status = "ok" if delta <= 1e-3 else "failed"
        return {"status": status, "mode": "torch-parity",
                "max_abs_delta": round(delta, 8),
                "vocab_size": vocab_size, "d_model": d_model,
                "n_layers": n_layers, "n_heads": int(heads)}
    except Exception as e:  # noqa: BLE001
        return {"status": "ok", "mode": f"load-only ({type(e).__name__})",
                "vocab_size": vocab_size, "d_model": d_model,
                "n_layers": n_layers}


def check_vae(model_dir: str) -> dict:
    import numpy as np

    vae_dir = os.path.join(model_dir, "vae")
    if not os.path.isdir(vae_dir):
        return {"status": "missing",
                "stage": "vae/ (diffusers AutoencoderKL dir: config.json + "
                         "diffusion_pytorch_model.safetensors)"}
    import jax
    import jax.numpy as jnp

    from stable_diffusion_pytorch_tpu.models.diffusers_vae import load_diffusers_vae

    loaded = load_diffusers_vae(vae_dir)
    if loaded is None:
        return {"status": "failed", "error": "load_diffusers_vae returned None"}
    vae, params = loaded
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    posterior = vae.apply(params, img, method=vae.encode)
    z = posterior.latent_dist.mean
    recon = np.asarray(vae.apply(params, z, method=vae.decode))
    if not np.all(np.isfinite(recon)):
        return {"status": "failed", "error": "non-finite decode"}
    out = {"latent_shape": list(np.asarray(z).shape)}
    try:
        import torch
        from diffusers import AutoencoderKL as TorchVAE

        tv = TorchVAE.from_pretrained(vae_dir).eval()
        with torch.no_grad():
            t_img = torch.from_numpy(
                np.transpose(np.asarray(img), (0, 3, 1, 2)).copy())
            t_mean = tv.encode(t_img).latent_dist.mean
            t_recon = tv.decode(t_mean).sample.numpy()
        delta_mean = float(np.max(np.abs(
            np.transpose(t_mean.numpy(), (0, 2, 3, 1)) - np.asarray(z))))
        delta_recon = float(np.max(np.abs(
            np.transpose(t_recon, (0, 2, 3, 1)) - recon)))
        status = "ok" if max(delta_mean, delta_recon) <= 5e-3 else "failed"
        out.update({"status": status, "mode": "diffusers-parity",
                    "max_abs_delta_encode": round(delta_mean, 8),
                    "max_abs_delta_decode": round(delta_recon, 8)})
        return out
    except Exception as e:  # noqa: BLE001
        out.update({"status": "ok", "mode": f"load-only ({type(e).__name__})"})
        return out


def check_unet(model_dir: str) -> dict:
    import numpy as np

    pt = os.path.join(model_dir, "unet.pt")
    if not os.path.exists(pt):
        return {"status": "missing",
                "stage": "unet.pt (reference-format torch checkpoint)"}
    import jax
    import jax.numpy as jnp

    from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig
    from stable_diffusion_pytorch_tpu.utils.compat import CompatConfig
    from stable_diffusion_pytorch_tpu.utils.torch_port import (
        convert_reference_unet,
        load_reference_checkpoint,
    )

    sd = load_reference_checkpoint(pt)
    # infer what the state dict pins down directly
    ch0 = int(sd["conv_in.weight"].shape[0])
    t_emb = int(sd["time_embedding.0.weight"].shape[0])
    ctx_keys = [k for k in sd if k.endswith("cross_attn.to_k.weight")]
    ctx_dim = int(sd[ctx_keys[0]].shape[1]) if ctx_keys else 768
    extra = {}
    # optional sidecar pinning the architecture (stage it next to unet.pt
    # when the checkpoint is not one of the inferable configs)
    sidecar = os.path.join(model_dir, "unet_config.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            extra = json.load(f)
    if "channels_list" in extra:
        candidates = [list(extra.pop("channels_list"))]
    else:
        # the reference default, SD-1.5 scale, or [ch0, 2*ch0]
        candidates = [[160, 320], [320, 640, 1280, 1280], [ch0, ch0 * 2]]
        candidates = [c for c in candidates if c[0] == ch0]
    extra.setdefault("time_emb_dim", t_emb)
    extra.setdefault("context_dim", ctx_dim)
    last_err = None
    for channels in candidates:
        try:
            cfg = UnetConfig(channels_list=channels, **extra)
            params = convert_reference_unet(sd, cfg, 4)
        except Exception as e:  # noqa: BLE001 — try the next candidate
            last_err = f"{channels}: {type(e).__name__}: {e}"
            continue
        compat = CompatConfig(flipped_time_embedding=True,
                              bottleneck_default_groups=True)
        unet = UNetModel.from_config(4, 4, cfg, compat=compat)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
        t = np.array([5], np.int64)
        ctx = rng.standard_normal((1, 77, cfg.context_dim)).astype(np.float32)
        out = np.asarray(unet.apply(
            params, jnp.asarray(x), jnp.asarray(t, jnp.int32), jnp.asarray(ctx)))
        if not np.all(np.isfinite(out)):
            return {"status": "failed", "error": "non-finite forward",
                    "channels_list": channels}
        result = {"channels_list": channels,
                  "params": int(sum(np.asarray(v).size for v in sd.values()))}
        # cross-framework parity through the reference torch implementation
        try:
            import torch
            from types import SimpleNamespace

            import stable_diffusion.models.utils  # noqa: F401 (circular import)
            from stable_diffusion.models.unet import UNetModel as RefUNet

            ref = RefUNet(4, 4, SimpleNamespace(
                num_res_blocks=cfg.num_res_blocks, n_heads=cfg.n_heads,
                attention_resolutions=list(cfg.attention_resolutions),
                channels_list=channels, time_emb_dim=cfg.time_emb_dim,
                dropout=0.0, n_layers=cfg.n_layers,
                context_dim=cfg.context_dim)).eval()
            ref.load_state_dict(
                {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()})
            with torch.no_grad():
                theirs = np.transpose(ref(
                    torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
                    torch.from_numpy(t),
                    torch.from_numpy(ctx),
                ).numpy(), (0, 2, 3, 1))
            delta = float(np.max(np.abs(out - theirs)))
            result.update({"status": "ok" if delta <= 1e-3 else "failed",
                           "mode": "torch-parity",
                           "max_abs_delta": round(delta, 8)})
        except Exception as e:  # noqa: BLE001 — reference arch mismatch
            result.update({"status": "ok",
                           "mode": f"convert+forward only ({type(e).__name__})"})
        return result
    return {"status": "failed", "error": f"no candidate config converted: {last_err}"}


def check_inception(model_dir: str) -> dict:
    import numpy as np

    from stable_diffusion_pytorch_tpu.models.inception import load_inception_params

    params = load_inception_params(model_dir)
    if params is None:
        return {"status": "missing",
                "stage": "inception/inception_v3.{npz,safetensors,pth} "
                         "(torchvision inception_v3 state dict)"}
    from stable_diffusion_pytorch_tpu.utils.fid import (
        FlaxInceptionFeatureExtractor,
        fid_between,
    )

    ex = FlaxInceptionFeatureExtractor(params=params, model_dir=model_dir)
    rng = np.random.default_rng(0)
    imgs_a = [rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32) for _ in range(8)]
    imgs_b = [np.clip(a + 0.5, -1, 1) for a in imgs_a]
    same = fid_between(ex, imgs_a, imgs_a, batch_size=4)
    diff = fid_between(ex, imgs_a, imgs_b, batch_size=4)
    ok = abs(same) < 0.5 and diff > abs(same) * 10
    return {"status": "ok" if ok else "failed",
            "fid_identical": round(same, 4), "fid_shifted": round(diff, 4),
            "note": "canonical Inception FID ready (tools/fid_eval.py "
                    "FID_EXTRACTOR=inception)"}


def check_clip_vision(model_dir: str) -> dict:
    import numpy as np

    from stable_diffusion_pytorch_tpu.models.clip_vision import (
        CLIPScorer,
        load_full_clip_params,
    )

    loaded = load_full_clip_params(model_dir)
    if loaded is None:
        return {"status": "missing",
                "stage": "clip_full/model.safetensors (full HF CLIPModel, "
                         "e.g. openai/clip-vit-base-patch32)"}
    tok_dir = os.path.join(model_dir, "tokenizer")
    if os.path.exists(os.path.join(tok_dir, "vocab.json")):
        from stable_diffusion_pytorch_tpu.models.bpe import CLIPBPETokenizer

        tokenizer = CLIPBPETokenizer.from_dir(tok_dir)
    else:
        from stable_diffusion_pytorch_tpu.models.clip import HashTokenizer

        tokenizer = HashTokenizer()

    # tower shapes from the weights; head counts from clip_full/config.json
    # (HF ships one next to every model.safetensors)
    text_params, vision_params = loaded[0], loaded[1]
    tt = text_params["params"]
    vocab, d_t = (int(s) for s in tt["token_embedding"]["embedding"].shape)
    vt = vision_params["params"]
    patch = int(vt["patch_embedding"]["kernel"].shape[0])
    d_v = int(vt["patch_embedding"]["kernel"].shape[3])
    n_pos = int(vt["position_embedding"].shape[0])
    grid = int(round((n_pos - 1) ** 0.5))
    heads_t, heads_v = None, None
    conf_path = os.path.join(model_dir, "clip_full", "config.json")
    if os.path.exists(conf_path):
        with open(conf_path) as f:
            conf = json.load(f)
        heads_t = conf.get("text_config", {}).get("num_attention_heads")
        heads_v = conf.get("vision_config", {}).get("num_attention_heads")
    text_cfg = dict(
        vocab_size=vocab, d_model=d_t,
        n_layers=sum(1 for k in tt if k.startswith("layer_")),
        n_heads=int(heads_t or (12 if d_t % 12 == 0 else 8)),
        intermediate=int(tt["layer_0"]["fc1"]["kernel"].shape[1]),
        max_positions=int(tt["position_embedding"].shape[0]),
    )
    vision_cfg = dict(
        image_size=patch * grid, patch_size=patch, d_model=d_v,
        n_layers=sum(1 for k in vt if k.startswith("layer_")),
        n_heads=int(heads_v or (16 if d_v % 16 == 0 else 12)),
        intermediate=int(vt["layer_0"]["fc1"]["kernel"].shape[1]),
    )
    scorer = CLIPScorer(tokenizer, model_dir=model_dir, params=loaded,
                        text_cfg=text_cfg, vision_cfg=vision_cfg)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    score = scorer.score(img, ["a probe caption"])
    return {"status": "ok" if np.isfinite(score) else "failed",
            "pretrained": scorer.pretrained, "probe_score": round(score, 4)}


CHECKS = {
    "tokenizer": check_tokenizer,
    "text_encoder": check_text_encoder,
    "vae": check_vae,
    "unet": check_unet,
    "inception": check_inception,
    "clip_vision": check_clip_vision,
}


def main(argv=None) -> dict:
    os.environ["JAX_PLATFORMS"] = os.environ.get("STAGE_PLATFORM", "cpu")
    from stable_diffusion_pytorch_tpu.utils.platform import ensure_platform

    ensure_platform()

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-dir", default="data/pretrained")
    parser.add_argument("--only", default=None,
                        help=f"comma-separated subset of {sorted(CHECKS)}")
    args = parser.parse_args(argv)

    names = (args.only.split(",") if args.only else list(CHECKS))
    report = {}
    for name in names:
        log(f"[stage_check] {name}...")
        try:
            report[name] = CHECKS[name](args.model_dir)
        except Exception as e:  # noqa: BLE001
            report[name] = {"status": "failed",
                            "error": f"{type(e).__name__}: {e}",
                            "traceback": traceback.format_exc()[-1500:]}
        log(f"[stage_check] {name}: {report[name]['status']}")

    missing = [n for n, r in report.items() if r["status"] == "missing"]
    failed = [n for n, r in report.items() if r["status"] == "failed"]
    summary = {"model_dir": args.model_dir, "checks": report,
               "missing": missing, "failed": failed}
    print(json.dumps(summary), flush=True)
    if failed:
        log(f"FAILED: {failed}")
        sys.exit(1)
    if missing:
        log("Missing artifacts — stage these to close the north-star clause:")
        for n in missing:
            log(f"  {n}: {report[n]['stage']}")
        sys.exit(2)
    log("All staged artifacts verified.")
    return summary


if __name__ == "__main__":
    main()
