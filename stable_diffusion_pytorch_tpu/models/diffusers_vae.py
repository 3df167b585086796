"""Diffusers-architecture AutoencoderKL in Flax (NHWC) + weight converter.

The reference's UNet trainer does NOT use its own from-scratch VAE: it swaps in
the frozen pretrained diffusers ``AutoencoderKL`` from
``runwayml/stable-diffusion-v1-5`` (/root/reference/train_unet.py:68-73) and
trains the UNet in THAT latent space (no 0.18215 scaling anywhere — encode is
``vae.encode(x).latent_dist.sample()`` verbatim, train_unet.py:502-504, and
decode output is ``.sample``, train_unet.py:562-563). Reproducing that
capability requires the diffusers VAE *architecture* — different topology from
the reference's own AutoEncoderKL (mid-block attention, per-level resnet
counts, GroupNorm eps 1e-6, asymmetric stride-2 downsampling) — plus a
state-dict converter so locally staged SD-1.5 weights load end-to-end.

Architecture (SD-1.5 ``vae`` config):
- Encoder: conv_in -> 4 DownEncoderBlock2D (2 resnets each; stride-2 conv with
  asymmetric (0,1)x(0,1) padding between levels) -> mid (resnet, single-head
  attention over h*w tokens, resnet) -> GN(eps 1e-6)+SiLU -> conv_out (8ch)
  -> quant_conv 1x1.
- Decoder: post_quant_conv 1x1 -> conv_in -> mid -> 4 UpDecoderBlock2D
  (3 resnets each; nearest x2 + conv between levels) -> GN+SiLU -> conv_out.
- Posterior log-variance clamped to [-30, 20] (diffusers
  DiagonalGaussianDistribution semantics).

TPU-native details: NHWC layout, GroupNorm through ops.groupnorm (fused Pallas
kernel / layout-friendly matmul-GN), the 4096-token mid-block attention through
ops.attention (flash kernel with VMEM-adaptive q-blocks for d_head=512).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from stable_diffusion_pytorch_tpu.models.blocks import GaussianDistribution
from stable_diffusion_pytorch_tpu.ops.attention import multi_head_attention
from stable_diffusion_pytorch_tpu.ops.groupnorm import group_norm


def _conv(features: int, kernel: int, stride: int = 1, name: str = "",
          dtype=jnp.float32, padding="SAME"):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class _GN(nn.Module):
    """GroupNorm(eps 1e-6) with params named scale/bias; optional fused SiLU."""

    groups: int
    silu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, self.groups, eps=1e-6,
                          apply_silu=self.silu)


class _ResnetBlock(nn.Module):
    """diffusers ResnetBlock2D (no time embedding in the VAE)."""

    out_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = _GN(self.groups, silu=True, dtype=self.dtype, name="norm1")(x)
        h = _conv(self.out_channels, 3, name="conv1", dtype=self.dtype)(h)
        h = _GN(self.groups, silu=True, dtype=self.dtype, name="norm2")(h)
        h = _conv(self.out_channels, 3, name="conv2", dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, 1, name="conv_shortcut", dtype=self.dtype)(x)
        return x + h


class _AttnBlock(nn.Module):
    """diffusers VAE mid-block attention: GN -> single-head QKV over h*w tokens
    -> out projection -> residual."""

    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        h = _GN(self.groups, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        dense = lambda name: nn.Dense(  # noqa: E731
            c, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("to_q")(h)[:, :, None, :]  # [B, N, 1, C]
        k = dense("to_k")(h)[:, :, None, :]
        v = dense("to_v")(h)[:, :, None, :]
        attn = multi_head_attention(q, k, v, scale=c**-0.5)
        attn = attn.reshape(b, hh * ww, c)
        out = dense("to_out")(attn).reshape(b, hh, ww, c)
        return x + out


class _Mid(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _ResnetBlock(self.channels, self.groups, self.dtype, name="res_0")(x)
        x = _AttnBlock(self.channels, self.groups, self.dtype, name="attn")(x)
        return _ResnetBlock(self.channels, self.groups, self.dtype, name="res_1")(x)


class _Encoder(nn.Module):
    block_out_channels: Tuple[int, ...]
    layers_per_block: int
    latent_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _conv(self.block_out_channels[0], 3, name="conv_in", dtype=self.dtype)(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = _ResnetBlock(ch, self.groups, self.dtype,
                                 name=f"down_{i}_res_{j}")(x)
            if i < len(self.block_out_channels) - 1:
                # diffusers Downsample2D: asymmetric (0,1)x(0,1) pad + VALID s2
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = _conv(ch, 3, stride=2, padding="VALID",
                          name=f"down_{i}_downsample", dtype=self.dtype)(x)
        x = _Mid(self.block_out_channels[-1], self.groups, self.dtype, name="mid")(x)
        x = _GN(self.groups, silu=True, dtype=self.dtype, name="conv_norm_out")(x)
        return _conv(2 * self.latent_channels, 3, name="conv_out",
                     dtype=self.dtype)(x)


class _Decoder(nn.Module):
    block_out_channels: Tuple[int, ...]
    layers_per_block: int
    out_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        reversed_ch = tuple(reversed(self.block_out_channels))
        x = _conv(reversed_ch[0], 3, name="conv_in", dtype=self.dtype)(z)
        x = _Mid(reversed_ch[0], self.groups, self.dtype, name="mid")(x)
        for i, ch in enumerate(reversed_ch):
            # decoder blocks have layers_per_block + 1 resnets (diffusers
            # UpDecoderBlock2D)
            for j in range(self.layers_per_block + 1):
                x = _ResnetBlock(ch, self.groups, self.dtype,
                                 name=f"up_{i}_res_{j}")(x)
            if i < len(reversed_ch) - 1:
                b, hh, ww, c = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = _conv(ch, 3, name=f"up_{i}_upsample", dtype=self.dtype)(x)
        x = _GN(self.groups, silu=True, dtype=self.dtype, name="conv_norm_out")(x)
        return _conv(self.out_channels, 3, name="conv_out", dtype=self.dtype)(x)


class DiffusersAutoencoderKL(nn.Module):
    """diffusers AutoencoderKL with the from-scratch AutoEncoderKL's call
    surface (encode/.latent_dist, decode -> raw tensor), so the trainers and
    pipeline swap it in exactly like train_unet.py:68-73 swaps the torch one."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.encoder = _Encoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels,
            self.groups, self.dtype, name="encoder",
        )
        self.decoder = _Decoder(
            self.block_out_channels, self.layers_per_block, self.out_channels,
            self.groups, self.dtype, name="decoder",
        )
        self.quant_conv = _conv(2 * self.latent_channels, 1, name="quant_conv",
                                dtype=self.dtype)
        self.post_quant_conv = _conv(self.latent_channels, 1,
                                     name="post_quant_conv", dtype=self.dtype)

    def encode(self, img: jnp.ndarray, deterministic: bool = True):
        from stable_diffusion_pytorch_tpu.models.autoencoder import (
            AutoEncoderKLOutput,
        )

        moments = self.quant_conv(self.encoder(img))
        c = self.latent_channels
        mean, log_var = moments[..., :c], moments[..., c:]
        log_var = jnp.clip(log_var, -30.0, 20.0)  # diffusers clamp
        return AutoEncoderKLOutput(GaussianDistribution(mean, log_var))

    def decode(self, latent: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(latent))

    def __call__(self, img: jnp.ndarray, sample_key=None, deterministic: bool = True):
        posterior = self.encode(img)
        dist = posterior.latent_dist
        z = dist.sample(sample_key) if sample_key is not None else dist.mode()
        return self.decode(z), posterior

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def channels_list(self) -> Tuple[int, ...]:
        """Alias so LatentDiffusion/pipeline shape math treats this module
        interchangeably with the from-scratch AutoEncoderKL."""
        return self.block_out_channels


# --------------------------------------------------------------------------- #
# weight conversion (diffusers state_dict -> our NHWC param tree)
# --------------------------------------------------------------------------- #


def _t_conv(w) -> np.ndarray:
    """torch conv [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t_lin(w) -> np.ndarray:
    """torch linear [O, I] -> flax [I, O]."""
    return np.transpose(np.asarray(w), (1, 0))


def _read_state_dict(vae_dir: str) -> Optional[dict]:
    for fname in ("diffusion_pytorch_model.safetensors", "model.safetensors"):
        path = os.path.join(vae_dir, fname)
        if os.path.exists(path):
            from safetensors.numpy import load_file

            return load_file(path)
    for fname in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
        path = os.path.join(vae_dir, fname)
        if os.path.exists(path):
            import torch

            return {
                k: v.float().numpy()
                for k, v in torch.load(path, map_location="cpu").items()
            }
    return None


def read_vae_config(vae_dir: str) -> dict:
    """Module kwargs from a diffusers config.json (SD-1.5 defaults otherwise)."""
    cfg_path = os.path.join(vae_dir, "config.json")
    out = dict(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(128, 256, 512, 512), layers_per_block=2, groups=32,
    )
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        out.update(
            in_channels=raw.get("in_channels", 3),
            out_channels=raw.get("out_channels", 3),
            latent_channels=raw.get("latent_channels", 4),
            block_out_channels=tuple(raw.get("block_out_channels", out["block_out_channels"])),
            layers_per_block=raw.get("layers_per_block", 2),
            groups=raw.get("norm_num_groups", 32),
        )
    return out


def convert_diffusers_vae_state(state: dict) -> dict:
    """Map a diffusers AutoencoderKL state_dict to our param tree.

    Handles both modern attention names (to_q/to_k/to_v/to_out.0) and the
    pre-0.15 names the reference's era used (query/key/value/proj_attn); the
    old 1x1-conv-shaped attention weights [O, I, 1, 1] are squeezed to linear.
    """
    g = lambda k: np.asarray(state[k])  # noqa: E731

    def conv(prefix: str) -> dict:
        return {"kernel": _t_conv(g(prefix + ".weight")),
                "bias": g(prefix + ".bias")}

    def gn(prefix: str) -> dict:
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    def lin(prefix: str) -> dict:
        w = np.asarray(state[prefix + ".weight"])
        if w.ndim == 4:  # old diffusers stored attention projections as 1x1 convs
            w = w[:, :, 0, 0]
        return {"kernel": _t_lin(w), "bias": g(prefix + ".bias")}

    def resnet(dst: dict, name: str, src: str) -> None:
        r = {
            "norm1": gn(src + ".norm1"),
            "conv1": conv(src + ".conv1"),
            "norm2": gn(src + ".norm2"),
            "conv2": conv(src + ".conv2"),
        }
        if src + ".conv_shortcut.weight" in state:
            r["conv_shortcut"] = conv(src + ".conv_shortcut")
        dst[name] = r

    def attn(src: str) -> dict:
        if src + ".to_q.weight" in state:
            names = ("to_q", "to_k", "to_v")
            out_key = src + ".to_out.0"
        else:  # pre-0.15 naming
            names = ("query", "key", "value")
            out_key = src + ".proj_attn"
        q, k, v = (lin(f"{src}.{n}") for n in names)
        return {
            "group_norm": gn(src + ".group_norm")
            if src + ".group_norm.weight" in state
            else gn(src + ".norm"),
            "to_q": q, "to_k": k, "to_v": v,
            "to_out": lin(out_key),
        }

    enc: dict = {"conv_in": conv("encoder.conv_in"),
                 "conv_norm_out": gn("encoder.conv_norm_out"),
                 "conv_out": conv("encoder.conv_out")}
    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.conv1.weight" in state:
        j = 0
        while f"encoder.down_blocks.{i}.resnets.{j}.conv1.weight" in state:
            resnet(enc, f"down_{i}_res_{j}",
                   f"encoder.down_blocks.{i}.resnets.{j}")
            j += 1
        ds = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if ds + ".weight" in state:
            enc[f"down_{i}_downsample"] = conv(ds)
        i += 1
    mid: dict = {"attn": attn("encoder.mid_block.attentions.0")}
    resnet(mid, "res_0", "encoder.mid_block.resnets.0")
    resnet(mid, "res_1", "encoder.mid_block.resnets.1")
    enc["mid"] = mid

    dec: dict = {"conv_in": conv("decoder.conv_in"),
                 "conv_norm_out": gn("decoder.conv_norm_out"),
                 "conv_out": conv("decoder.conv_out")}
    i = 0
    while f"decoder.up_blocks.{i}.resnets.0.conv1.weight" in state:
        j = 0
        while f"decoder.up_blocks.{i}.resnets.{j}.conv1.weight" in state:
            resnet(dec, f"up_{i}_res_{j}", f"decoder.up_blocks.{i}.resnets.{j}")
            j += 1
        us = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if us + ".weight" in state:
            dec[f"up_{i}_upsample"] = conv(us)
        i += 1
    midd: dict = {"attn": attn("decoder.mid_block.attentions.0")}
    resnet(midd, "res_0", "decoder.mid_block.resnets.0")
    resnet(midd, "res_1", "decoder.mid_block.resnets.1")
    dec["mid"] = midd

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": conv("quant_conv"),
            "post_quant_conv": conv("post_quant_conv"),
        }
    }


def load_diffusers_vae(
    vae_dir: str, dtype: jnp.dtype = jnp.float32
) -> Optional[Tuple[DiffusersAutoencoderKL, dict]]:
    """(module, params) from a locally staged diffusers VAE directory (the
    layout ``AutoencoderKL.from_pretrained(..., subfolder="vae")`` caches);
    None when no weights are present."""
    state = _read_state_dict(vae_dir)
    if state is None:
        return None
    cfg = read_vae_config(vae_dir)
    module = DiffusersAutoencoderKL(dtype=dtype, **cfg)
    return module, convert_diffusers_vae_state(state)
