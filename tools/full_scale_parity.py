#!/usr/bin/env python
"""Full-scale parity dress rehearsal (VERDICT r2 next-round item 1).

Every round-2 torch-parity test ran tiny configs (channels [16,32], ctx 24).
This script proves the converter + compat stack at the configurations that
matter, so staged real weights become a drop-in:

1. UNet forward parity at the reference's ACTUAL default config
   (/root/reference/stable_diffusion/models/unet.py:30-57 — channels
   [160,320], 8 heads, t_emb 512, ctx 768, dropout 0.1) on 64x64x4 latents
   (the 512^2-at-f8 latent size), weights converted from a real reference-
   format state dict via utils/torch_port.py.
2. UNet forward parity at SD-1.5 scale (presets.sd15_unet_config: 860M params,
   channels [320,640,1280,1280]) on 64x64x4 latents.
3. VAE encode/decode parity at SD-1.5 scale (f8, channels [128,256,512,512]).
4. Compat-mode sampling-loop parity at the reference's actual config: the
   reference LatentDiffusion.sample loop (quirky ascending order, swapped CFG,
   uniform init noise) vs our --reference-compat lax.scan, 5 steps, CFG 7.5.
5. BPE tokenizer equality vs HF CLIPTokenizer: on the synthetic staged-vocab
   fixture always; on the REAL vocab too when staged under
   data/pretrained/tokenizer/{vocab.json,merges.txt}.
6. bf16 drift: our SD-1.5 UNet f32 vs bf16-compute outputs (the TPU number).

Writes PARITY_FULLSCALE.json at the repo root and prints it. Thresholds:
f32 parity <= 1e-4 (forward) / 2e-3 (5-step sampling loop), bf16 drift <= 1e-1
(bf16 has ~2-3 decimal digits; recorded, not parity-gated).

Runtime: ~10-20 min single-CPU (SD-1.5-scale torch+jax forwards dominate).
"""

import json
import os
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.append("/root/reference")  # append: never shadow repo-root modules

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> dict:
    # hard-set: the shell pins JAX_PLATFORMS=axon, which setdefault would
    # keep, silently routing this CPU-targeted harness onto the tunneled TPU
    # (PARITY_PLATFORM overrides deliberately)
    os.environ["JAX_PLATFORMS"] = os.environ.get("PARITY_PLATFORM", "cpu")
    from stable_diffusion_pytorch_tpu.utils.platform import ensure_platform

    ensure_platform()

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    import stable_diffusion.models.utils  # noqa: F401 (break circular import)
    from stable_diffusion.models.autoencoder import AutoEncoderKL as RefVAE
    from stable_diffusion.models.latent_diffusion import LatentDiffusion as RefLD
    from stable_diffusion.models.scheduler import DDPMScheduler as RefSched
    from stable_diffusion.models.unet import UNetModel as RefUNet

    from stable_diffusion_pytorch_tpu.models import presets
    from stable_diffusion_pytorch_tpu.models.autoencoder import AutoEncoderKL
    from stable_diffusion_pytorch_tpu.models.latent_diffusion import make_sample_fn
    from stable_diffusion_pytorch_tpu.models.schedule import DDPMConfig, make_schedule
    from stable_diffusion_pytorch_tpu.models.unet import UNetModel, UnetConfig
    from stable_diffusion_pytorch_tpu.utils.compat import CompatConfig
    from stable_diffusion_pytorch_tpu.utils.torch_port import (
        convert_reference_autoencoder,
        convert_reference_unet,
    )

    torch.set_num_threads(max(os.cpu_count() or 1, 1))
    compat = CompatConfig(
        flipped_time_embedding=True, bottleneck_default_groups=True
    )
    result: dict = {"metric": "full_scale_parity"}
    rng = np.random.default_rng(0)

    def nchw(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    def unet_forward_delta(cfg_kwargs: dict, label: str, batch: int = 1):
        """Reference torch UNet at cfg -> state dict -> convert -> compare."""
        log(f"[{label}] building torch reference UNet...")
        torch.manual_seed(0)
        ref = RefUNet(4, 4, SimpleNamespace(**cfg_kwargs)).eval()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        n_params = sum(v.size for v in sd.values())
        log(f"[{label}] {n_params / 1e6:.0f}M params; torch forward...")

        x = rng.standard_normal((batch, 64, 64, 4)).astype(np.float32)
        t = np.array([847] * batch, np.int64)
        ctx = rng.standard_normal((batch, 77, cfg_kwargs["context_dim"])).astype(
            np.float32
        )
        with torch.no_grad():
            theirs = np.transpose(
                ref(nchw(x), torch.from_numpy(t), torch.from_numpy(ctx)).numpy(),
                (0, 2, 3, 1),
            )
        del ref

        unet_cfg = UnetConfig(**cfg_kwargs)
        params = convert_reference_unet(sd, unet_cfg, 4)
        del sd
        log(f"[{label}] jax f32 forward...")
        ours_f32 = UNetModel.from_config(4, 4, unet_cfg, compat=compat)
        out = np.asarray(
            jax.jit(ours_f32.apply)(
                params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
            )
        )
        delta = float(np.max(np.abs(out - theirs)))
        scale = float(np.max(np.abs(theirs)) or 1.0)
        log(f"[{label}] f32 max|delta| = {delta:.3e} (output scale {scale:.2f})")
        return delta, params, unet_cfg, (x, t, ctx), theirs

    # ---- 1. reference actual config (unet.py:30-57 defaults) ---- #
    ref_cfg = dict(
        num_res_blocks=2, n_heads=8, attention_resolutions=[0, 1],
        channels_list=[160, 320], time_emb_dim=512, dropout=0.1, n_layers=2,
        context_dim=768,
    )
    d, ref_params, ref_unet_cfg, _, _ = unet_forward_delta(
        ref_cfg, "reference-config-unet"
    )
    result["unet_reference_config_f32_max_delta"] = d

    # ---- 2+6. SD-1.5 scale ---- #
    sd15 = presets.sd15_unet_config()
    sd15_kwargs = dict(
        num_res_blocks=sd15.num_res_blocks, n_heads=sd15.n_heads,
        attention_resolutions=list(sd15.attention_resolutions),
        channels_list=list(sd15.channels_list), time_emb_dim=sd15.time_emb_dim,
        dropout=sd15.dropout, n_layers=sd15.n_layers,
        context_dim=sd15.context_dim,
    )
    d, sd15_params, sd15_cfg, sd15_inputs, _ = unet_forward_delta(
        sd15_kwargs, "sd15-unet"
    )
    result["unet_sd15_f32_max_delta"] = d

    log("[sd15-unet] bf16 drift...")
    x, t, ctx = sd15_inputs
    ours_bf16 = UNetModel.from_config(4, 4, sd15_cfg, compat=compat, dtype=jnp.bfloat16)
    out_bf16 = np.asarray(
        jax.jit(ours_bf16.apply)(
            sd15_params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        ),
        np.float32,
    )
    ours_f32m = UNetModel.from_config(4, 4, sd15_cfg, compat=compat)
    out_f32 = np.asarray(
        jax.jit(ours_f32m.apply)(
            sd15_params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        )
    )
    result["unet_sd15_bf16_vs_f32_max_delta"] = float(
        np.max(np.abs(out_bf16 - out_f32))
    )
    del sd15_params

    # ---- 3. SD-1.5-scale VAE ---- #
    log("[sd15-vae] building torch reference VAE...")
    vcfg = presets.sd15_autoencoder_config()
    v_kwargs = dict(
        in_channels=3, latent_channels=4, out_channels=3,
        autoencoder_channels_list=list(vcfg.autoencoder_channels_list),
        autoencoder_num_res_blocks=vcfg.autoencoder_num_res_blocks,
        groups=vcfg.groups, kl_weight=1.0,
    )
    torch.manual_seed(1)
    ref_vae = RefVAE(SimpleNamespace(**v_kwargs)).eval()
    vae_sd = {k: v.numpy() for k, v in ref_vae.state_dict().items()}
    vae_params = convert_reference_autoencoder(vae_sd, vcfg)
    our_vae = AutoEncoderKL.from_config(vcfg, compat=compat)

    img = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)
    log("[sd15-vae] encode parity...")
    with torch.no_grad():
        dist = ref_vae.encode(nchw(img)).latent_dist
        ref_mean = np.transpose(dist.mean.numpy(), (0, 2, 3, 1))
    post = our_vae.apply(vae_params, jnp.asarray(img), method=our_vae.encode)
    result["vae_sd15_encode_f32_max_delta"] = float(
        np.max(np.abs(np.asarray(post.latent_dist.mean) - ref_mean))
    )
    log("[sd15-vae] decode parity...")
    z = rng.standard_normal((1, 32, 32, 4)).astype(np.float32)
    with torch.no_grad():
        ref_img = np.transpose(ref_vae.decode(nchw(z)).numpy(), (0, 2, 3, 1))
    dec = our_vae.apply(vae_params, jnp.asarray(z), method=our_vae.decode)
    result["vae_sd15_decode_f32_max_delta"] = float(
        np.max(np.abs(np.asarray(dec) - ref_img))
    )
    del ref_vae, vae_sd, vae_params

    # ---- 4. compat sampling-loop parity at the reference's actual config ---- #
    log("[sampling-loop] reference torch 5-step loop at real config...")
    torch.manual_seed(0)
    ref_unet_t = RefUNet(4, 4, SimpleNamespace(**ref_cfg)).eval()
    sched_cfg = SimpleNamespace(
        noise_schedule="linear", noise_steps=1000, beta_start=1e-4, beta_end=0.02
    )
    uncond = rng.standard_normal((1, 77, 768)).astype(np.float32)
    ctx_np = rng.standard_normal((1, 77, 768)).astype(np.float32)

    class FakeTextEncoder:
        def tokenize(self, prompts, **kw):
            return SimpleNamespace(
                input_ids=torch.zeros((len(prompts), 77), dtype=torch.long)
            )

        def encode_text(self, ids):
            return [torch.from_numpy(uncond).expand(ids.shape[0], -1, -1)]

    ref_model = RefLD(
        ref_unet_t, None, FakeTextEncoder(), RefSched(sched_cfg)
    ).eval()
    steps = 5
    torch.manual_seed(123)
    noise = torch.rand(1, 4, 64, 64)
    with torch.no_grad():
        ref_x0 = np.transpose(
            ref_model.sample(
                noised_sample=noise,
                context_emb=torch.from_numpy(ctx_np),
                guidance_scale=7.5,
                scale_factor=0.0,  # kill the stochastic posterior term: torch
                # and jax draw from different RNG streams, so only the
                # deterministic loop is comparable (same as
                # tests/test_sampling_parity.py)
                time_steps=steps,
            ).numpy(),
            (0, 2, 3, 1),
        )
    del ref_model, ref_unet_t

    log("[sampling-loop] our reference-compat scan...")
    cc = CompatConfig(reference_compat=True).resolved()
    our_unet_c = UNetModel.from_config(4, 4, ref_unet_cfg, compat=cc)
    schedule = make_schedule(DDPMConfig(noise_steps=1000))
    fn = jax.jit(
        make_sample_fn(
            our_unet_c, schedule, num_steps=steps, sampler="ddpm",
            guidance_scale=7.5, scale_factor=0.0, reference_cfg_formula=True,
            ascending_loop=True, leading_timesteps=True,
        )
    )
    x_T = jnp.asarray(np.transpose(noise.numpy(), (0, 2, 3, 1)))
    ours_x0 = np.asarray(
        fn(
            ref_params, x_T, jnp.asarray(ctx_np), jnp.asarray(uncond),
            jax.random.PRNGKey(0),
        )
    )
    result["sampling_loop_5step_f32_max_delta"] = float(
        np.max(np.abs(ours_x0 - ref_x0))
    )
    result["sampling_loop_output_scale"] = float(np.max(np.abs(ref_x0)))

    # ---- 5. BPE vs HF ---- #
    log("[bpe] HF token-for-token equality...")
    result.update(bpe_parity())

    # ---- verdicts ---- #
    # thresholds match the repo's established torch-parity tolerances
    # (tests/test_torch_parity.py: 5e-4; test_sampling_parity.py: 2e-3)
    result["pass_f32_forward"] = bool(
        result["unet_reference_config_f32_max_delta"] <= 5e-4
        and result["unet_sd15_f32_max_delta"] <= 5e-4
        and result["vae_sd15_encode_f32_max_delta"] <= 5e-4
        and result["vae_sd15_decode_f32_max_delta"] <= 5e-4
    )
    result["pass_sampling_loop"] = bool(
        result["sampling_loop_5step_f32_max_delta"] <= 2e-3
    )
    out_path = os.path.join(REPO, "PARITY_FULLSCALE.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


def bpe_parity() -> dict:
    """Token-for-token HF equality: synthetic staged vocab always; real vocab
    when present under data/pretrained/tokenizer/."""
    import json as _json
    import tempfile

    import numpy as np

    from stable_diffusion_pytorch_tpu.models.bpe import CLIPBPETokenizer

    out: dict = {}
    try:
        from transformers import CLIPTokenizer
    except ImportError:
        return {"bpe_hf_parity": None}

    prompts = [
        "a photograph of an astronaut riding a horse",
        "cathedral reduce, oil painting!!  extra   spaces",
        "UNICODE café — emoji \U0001f600 ok",
        "",
    ]

    def compare(vdir: str) -> bool:
        hf = CLIPTokenizer(
            vocab_file=os.path.join(vdir, "vocab.json"),
            merges_file=os.path.join(vdir, "merges.txt"),
        )
        ours = CLIPBPETokenizer.from_dir(vdir)
        for p in prompts:
            a = np.asarray(
                hf([p], max_length=77, padding="max_length", truncation=True).input_ids
            )
            b = np.asarray(
                ours([p], max_length=77, padding="max_length", truncation=True).input_ids
            )
            if not np.array_equal(a, b):
                return False
        return True

    # synthetic fixture vocab (same layout as the published CLIP vocab)
    with tempfile.TemporaryDirectory() as d:
        base = [chr(i) for i in range(33, 33 + 94)] + ["Ġ"]
        vocab = {tok: i for i, tok in enumerate(base)}
        vocab.update({tok + "</w>": 300 + i for i, tok in enumerate(base)})
        merges = ["c a", "t h", "r e", "ca t</w>", "th e</w>", "re d"]
        for i, m in enumerate(merges):
            vocab[m.replace(" ", "")] = 600 + i
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        with open(os.path.join(d, "vocab.json"), "w") as f:
            _json.dump(vocab, f)
        with open(os.path.join(d, "merges.txt"), "w") as f:
            f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
        out["bpe_hf_parity_fixture"] = compare(d)

    real = os.path.join(REPO, "data", "pretrained", "tokenizer")
    if os.path.exists(os.path.join(real, "vocab.json")):
        out["bpe_hf_parity_real_vocab"] = compare(real)
    else:
        out["bpe_hf_parity_real_vocab"] = None  # not staged in this env
    return out


if __name__ == "__main__":
    main()
