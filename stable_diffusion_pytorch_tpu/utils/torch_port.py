"""Torch->Flax weight conversion for the reference architecture.

Converts a state_dict of the reference's from-scratch torch modules
(/root/reference/stable_diffusion/models/unet.py, autoencoder.py) into this
framework's Flax parameter trees, so:

- checkpoints trained with the PyTorch reference load directly into the
  TPU-native models ("matching the reference's checkpoints"), and
- full-model numerical parity can be tested torch-vs-flax with shared weights
  (tests/test_torch_parity.py).

Layout rules:
- Conv2d weight [O, I, kH, kW] -> flax [kH, kW, I, O] (transpose 2,3,1,0)
- Linear weight [O, I] -> kernel [I, O] (transpose)
- GroupNorm/LayerNorm weight/bias -> scale/bias
- torch NCHW activations correspond to our NHWC; parameter conversion above is
  exactly what makes the two layouts compute identical functions.

Module-name mapping mirrors the builder append order, which our static plans
reproduce one-to-one (models/unet.py:plan_input_blocks/plan_output_blocks vs
reference models/utils.py:35-190).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _conv(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"])
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _dense(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _norm(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _resblock(sd: Dict, prefix: str, has_time: bool) -> Dict:
    """Reference ResBlock (resnet2d.py:127-206): in_layers [GN,SiLU,Conv],
    time_embedding [SiLU,Linear], out_layers [GN,SiLU,Dropout,Conv], skip 1x1."""
    params = {
        "in_norm": _norm(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "out_norm": _norm(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if has_time and f"{prefix}.time_embedding.1.weight" in sd:
        params["time_proj"] = _dense(sd, f"{prefix}.time_embedding.1")
    if f"{prefix}.skip_connection.weight" in sd:
        params["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return params


def _cross_attention(sd: Dict, prefix: str) -> Dict:
    """CrossAttention (transformer.py:18-58): to_q/k/v (no bias), out Sequential[Linear, Dropout]."""
    return {
        "to_q": _dense(sd, f"{prefix}.to_q"),
        "to_k": _dense(sd, f"{prefix}.to_k"),
        "to_v": _dense(sd, f"{prefix}.to_v"),
        "out": _dense(sd, f"{prefix}.out.0"),
    }


def _transformer_block(sd: Dict, prefix: str) -> Dict:
    """BasicTransformerBlock (transformer.py:195-248)."""
    return {
        "self_attn": _cross_attention(sd, f"{prefix}.self_attn"),
        "cross_attn": _cross_attention(sd, f"{prefix}.cross_attn"),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "norm3": _norm(sd, f"{prefix}.norm3"),
        "ffn": {
            "geglu": {"proj": _dense(sd, f"{prefix}.ffn.net.0.proj")},
            "out": _dense(sd, f"{prefix}.ffn.net.2"),
        },
    }


def _spatial_transformer(sd: Dict, prefix: str, n_layers: int) -> Dict:
    """SpatialTransformer (transformer.py:282-348)."""
    params = {
        "norm": _norm(sd, f"{prefix}.norm"),
        "proj_in": _conv(sd, f"{prefix}.proj_in"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
    }
    for i in range(n_layers):
        params[f"block_{i}"] = _transformer_block(
            sd, f"{prefix}.transformer_blocks.{i}"
        )
    return params


def convert_reference_unet(sd: Dict, unet_cfg, latent_channels: int) -> Dict:
    """Reference UNetModel state_dict -> our UNetModel {'params': ...} tree.

    ``unet_cfg`` is a UnetConfig; block indices follow the shared plan order.
    NOTE: reference checkpoints use the sign-flipped sinusoid
    (timestep_embedding.py:93-99) — build the Flax model with
    ``flipped_time_embedding=True`` for numeric parity.
    """
    from stable_diffusion_pytorch_tpu.models.unet import (
        plan_input_blocks,
        plan_output_blocks,
    )

    p: Dict = {
        "time_fc1": _dense(sd, "time_embedding.0"),
        "time_fc2": _dense(sd, "time_embedding.2"),
        "conv_in": _conv(sd, "conv_in"),
        "out_norm": _norm(sd, "out.0"),
        "conv_out": _conv(sd, "out.2"),
        "mid_res1": _resblock(sd, "middle_block.0", has_time=True),
        "mid_attn": _spatial_transformer(sd, "middle_block.1", unet_cfg.n_layers),
        "mid_res2": _resblock(sd, "middle_block.2", has_time=True),
    }

    in_plan, skips, mid_ch, _, attn_mult = plan_input_blocks(
        unet_cfg.channels_list[0],
        unet_cfg.channels_list,
        unet_cfg.num_res_blocks,
        unet_cfg.attention_resolutions,
    )
    for i, block in enumerate(in_plan):
        ref = f"input_blocks.{i}"
        if block[0] == "res":
            p[f"in_{i}_res"] = _resblock(sd, f"{ref}.0", has_time=True)
            if block[3]:
                p[f"in_{i}_attn"] = _spatial_transformer(
                    sd, f"{ref}.1", unet_cfg.n_layers
                )
        else:
            p[f"in_{i}_down"] = {"conv": _conv(sd, f"{ref}.0.conv")}

    out_plan, _ = plan_output_blocks(
        unet_cfg.channels_list,
        unet_cfg.num_res_blocks,
        unet_cfg.attention_resolutions,
        skips,
        mid_ch,
        attn_mult,
    )
    for i, (_, _, _, attn, upsample) in enumerate(out_plan):
        ref = f"output_blocks.{i}"
        p[f"out_{i}_res"] = _resblock(sd, f"{ref}.0", has_time=True)
        idx = 1
        if attn:
            p[f"out_{i}_attn"] = _spatial_transformer(
                sd, f"{ref}.{idx}", unet_cfg.n_layers
            )
            idx += 1
        if upsample:
            # UpSample is nested in its own TimestepEmbedSequential (utils.py:186)
            p[f"out_{i}_up"] = {"conv": _conv(sd, f"{ref}.{idx}.0.conv")}
    return {"params": p}


def _vae_bottleneck(sd: Dict, prefix: str) -> Dict:
    """Encoder/Decoder bottleneck: ResBlock, raw CrossAttention, ResBlock
    (models/utils.py:100-131 with use_attn_only=True)."""
    return {
        "res1": _resblock(sd, f"{prefix}.0", has_time=False),
        "attn": _cross_attention(sd, f"{prefix}.1"),
        "res2": _resblock(sd, f"{prefix}.2", has_time=False),
    }


def convert_reference_autoencoder(sd: Dict, vae_cfg) -> Dict:
    """Reference AutoEncoderKL state_dict -> our AutoEncoderKL params tree."""
    from stable_diffusion_pytorch_tpu.models.unet import (
        plan_input_blocks,
        plan_output_blocks,
    )

    channels = vae_cfg.autoencoder_channels_list
    nres = vae_cfg.autoencoder_num_res_blocks

    enc: Dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "bottleneck": _vae_bottleneck(sd, "encoder.bottleneck"),
        "out_norm": _norm(sd, "encoder.out.0"),
        "out_conv": _conv(sd, "encoder.out.2"),
    }
    in_plan, _, _, _, _ = plan_input_blocks(channels[0], channels, nres, None)
    for i, block in enumerate(in_plan):
        ref = f"encoder.down.{i}"
        if block[0] == "res":
            enc[f"down_{i}_res"] = _resblock(sd, f"{ref}.0", has_time=False)
        else:
            enc[f"down_{i}"] = {"conv": _conv(sd, f"{ref}.0.conv")}

    dec: Dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "bottleneck": _vae_bottleneck(sd, "decoder.bottleneck"),
        "out_norm": _norm(sd, "decoder.out.0"),
        "out_conv": _conv(sd, "decoder.out.2"),
    }
    out_plan, _ = plan_output_blocks(channels, nres, None, [], channels[0], 0)
    for i, (_, _, _, _, upsample) in enumerate(out_plan):
        ref = f"decoder.up.{i}"
        dec[f"up_{i}_res"] = _resblock(sd, f"{ref}.0", has_time=False)
        if upsample:
            dec[f"up_{i}"] = {"conv": _conv(sd, f"{ref}.1.0.conv")}

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": _conv(sd, "quant_conv"),
            "post_quant_conv": _conv(sd, "post_quant_conv"),
        }
    }


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a numpy state_dict."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in state:
        state = state["state_dict"]
    return {k: v.numpy() for k, v in state.items()}
