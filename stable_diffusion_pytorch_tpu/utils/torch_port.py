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


# --------------------------------------------------------------------------- #
# Flax -> reference torch export (the inverse direction): checkpoints trained
# on TPU load back into the PyTorch reference with strict=True, so users can
# move in BOTH directions.
# --------------------------------------------------------------------------- #


def _exp_conv(params: Dict, out: Dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = np.transpose(np.asarray(params["kernel"]), (3, 2, 0, 1))
    if "bias" in params:
        out[f"{prefix}.bias"] = np.asarray(params["bias"])


def _exp_dense(params: Dict, out: Dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["kernel"]).T
    if "bias" in params:
        out[f"{prefix}.bias"] = np.asarray(params["bias"])


def _exp_norm(params: Dict, out: Dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["scale"])
    out[f"{prefix}.bias"] = np.asarray(params["bias"])


def _exp_resblock(params: Dict, out: Dict, prefix: str) -> None:
    _exp_norm(params["in_norm"], out, f"{prefix}.in_layers.0")
    _exp_conv(params["in_conv"], out, f"{prefix}.in_layers.2")
    _exp_norm(params["out_norm"], out, f"{prefix}.out_layers.0")
    _exp_conv(params["out_conv"], out, f"{prefix}.out_layers.3")
    if "time_proj" in params:
        _exp_dense(params["time_proj"], out, f"{prefix}.time_embedding.1")
    if "skip" in params:
        _exp_conv(params["skip"], out, f"{prefix}.skip_connection")


def _exp_cross_attention(params: Dict, out: Dict, prefix: str) -> None:
    _exp_dense(params["to_q"], out, f"{prefix}.to_q")
    _exp_dense(params["to_k"], out, f"{prefix}.to_k")
    _exp_dense(params["to_v"], out, f"{prefix}.to_v")
    _exp_dense(params["out"], out, f"{prefix}.out.0")


def _exp_spatial_transformer(params: Dict, out: Dict, prefix: str, n_layers: int) -> None:
    _exp_norm(params["norm"], out, f"{prefix}.norm")
    _exp_conv(params["proj_in"], out, f"{prefix}.proj_in")
    _exp_conv(params["proj_out"], out, f"{prefix}.proj_out")
    for i in range(n_layers):
        b = params[f"block_{i}"]
        ref = f"{prefix}.transformer_blocks.{i}"
        _exp_cross_attention(b["self_attn"], out, f"{ref}.self_attn")
        _exp_cross_attention(b["cross_attn"], out, f"{ref}.cross_attn")
        _exp_norm(b["norm1"], out, f"{ref}.norm1")
        _exp_norm(b["norm2"], out, f"{ref}.norm2")
        _exp_norm(b["norm3"], out, f"{ref}.norm3")
        _exp_dense(b["ffn"]["geglu"]["proj"], out, f"{ref}.ffn.net.0.proj")
        _exp_dense(b["ffn"]["out"], out, f"{ref}.ffn.net.2")


def export_reference_unet(tree: Dict, unet_cfg) -> Dict[str, np.ndarray]:
    """Our UNetModel {'params': ...} tree -> the reference UNetModel
    state_dict (exact inverse of convert_reference_unet; loads with
    strict=True). Checkpoints exported this way assume the reference's
    sign-flipped sinusoid — train with ``--flipped-time-embedding`` (or accept
    the embedding mismatch)."""
    from stable_diffusion_pytorch_tpu.models.unet import (
        plan_input_blocks,
        plan_output_blocks,
    )

    p = tree["params"] if "params" in tree else tree
    sd: Dict[str, np.ndarray] = {}
    _exp_dense(p["time_fc1"], sd, "time_embedding.0")
    _exp_dense(p["time_fc2"], sd, "time_embedding.2")
    _exp_conv(p["conv_in"], sd, "conv_in")
    _exp_norm(p["out_norm"], sd, "out.0")
    _exp_conv(p["conv_out"], sd, "out.2")
    _exp_resblock(p["mid_res1"], sd, "middle_block.0")
    _exp_spatial_transformer(p["mid_attn"], sd, "middle_block.1", unet_cfg.n_layers)
    _exp_resblock(p["mid_res2"], sd, "middle_block.2")

    in_plan, skips, mid_ch, _, attn_mult = plan_input_blocks(
        unet_cfg.channels_list[0],
        unet_cfg.channels_list,
        unet_cfg.num_res_blocks,
        unet_cfg.attention_resolutions,
    )
    for i, block in enumerate(in_plan):
        ref = f"input_blocks.{i}"
        if block[0] == "res":
            _exp_resblock(p[f"in_{i}_res"], sd, f"{ref}.0")
            if block[3]:
                _exp_spatial_transformer(
                    p[f"in_{i}_attn"], sd, f"{ref}.1", unet_cfg.n_layers
                )
        else:
            _exp_conv(p[f"in_{i}_down"]["conv"], sd, f"{ref}.0.conv")

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
        _exp_resblock(p[f"out_{i}_res"], sd, f"{ref}.0")
        idx = 1
        if attn:
            _exp_spatial_transformer(
                p[f"out_{i}_attn"], sd, f"{ref}.{idx}", unet_cfg.n_layers
            )
            idx += 1
        if upsample:
            _exp_conv(p[f"out_{i}_up"]["conv"], sd, f"{ref}.{idx}.0.conv")
    return sd


def export_reference_autoencoder(tree: Dict, vae_cfg) -> Dict[str, np.ndarray]:
    """Our AutoEncoderKL params tree -> the reference AutoEncoderKL state_dict
    (inverse of convert_reference_autoencoder)."""
    from stable_diffusion_pytorch_tpu.models.unet import (
        plan_input_blocks,
        plan_output_blocks,
    )

    p = tree["params"] if "params" in tree else tree
    channels = vae_cfg.autoencoder_channels_list
    nres = vae_cfg.autoencoder_num_res_blocks
    sd: Dict[str, np.ndarray] = {}

    def _exp_bottleneck(params, prefix):
        _exp_resblock(params["res1"], sd, f"{prefix}.0")
        _exp_cross_attention(params["attn"], sd, f"{prefix}.1")
        _exp_resblock(params["res2"], sd, f"{prefix}.2")

    enc = p["encoder"]
    _exp_conv(enc["conv_in"], sd, "encoder.conv_in")
    _exp_bottleneck(enc["bottleneck"], "encoder.bottleneck")
    _exp_norm(enc["out_norm"], sd, "encoder.out.0")
    _exp_conv(enc["out_conv"], sd, "encoder.out.2")
    in_plan, _, _, _, _ = plan_input_blocks(channels[0], channels, nres, None)
    for i, block in enumerate(in_plan):
        ref = f"encoder.down.{i}"
        if block[0] == "res":
            _exp_resblock(enc[f"down_{i}_res"], sd, f"{ref}.0")
        else:
            _exp_conv(enc[f"down_{i}"]["conv"], sd, f"{ref}.0.conv")

    dec = p["decoder"]
    _exp_conv(dec["conv_in"], sd, "decoder.conv_in")
    _exp_bottleneck(dec["bottleneck"], "decoder.bottleneck")
    _exp_norm(dec["out_norm"], sd, "decoder.out.0")
    _exp_conv(dec["out_conv"], sd, "decoder.out.2")
    out_plan, _ = plan_output_blocks(channels, nres, None, [], channels[0], 0)
    for i, (_, _, _, _, upsample) in enumerate(out_plan):
        ref = f"decoder.up.{i}"
        _exp_resblock(dec[f"up_{i}_res"], sd, f"{ref}.0")
        if upsample:
            _exp_conv(dec[f"up_{i}"]["conv"], sd, f"{ref}.1.0.conv")

    _exp_conv(p["quant_conv"], sd, "quant_conv")
    _exp_conv(p["post_quant_conv"], sd, "post_quant_conv")
    return sd


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a numpy state_dict as a torch checkpoint (f32 tensors)."""
    import torch

    torch.save(
        {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in sd.items()},
        path,
    )


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a numpy state_dict."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in state:
        state = state["state_dict"]
    return {k: v.numpy() for k, v in state.items()}
