"""From-scratch KL-regularized VAE in Flax, NHWC.

Counterpart of /root/reference/stable_diffusion/models/autoencoder.py:51-246.
Topology matches the reference exactly:

- Encoder: conv_in -> per-level ResBlocks + DownSample (the UNet input-block plan
  without time embedding or attention, autoencoder.py:174-184) -> bottleneck of
  ResBlock + raw single-head CrossAttention (4-D auto-flattened, models/utils.py:114-116)
  + ResBlock -> GN+SiLU+conv to 2*latent moments -> 1x1 quant_conv.
- Decoder: 1x1 post_quant_conv -> conv_in (latent -> channels_list[0]) -> bottleneck
  at channels_list[0] -> up blocks iterating levels in *reverse* config order
  (so the default decoder goes 64 -> 128 -> 64 channels, matching the reference's
  quirky Decoder at autoencoder.py:202-241) -> GN+SiLU+conv out head.

``encode`` returns an AutoEncoderKLOutput carrying a GaussianDistribution with
explicit-PRNG ``sample``; ``decode`` returns the raw image tensor (the reference's
decode also returns a raw tensor, autoencoder.py:148-161). Latents are NOT scaled
(the reference applies no 0.18215-style scaling anywhere).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from stable_diffusion_pytorch_tpu.config import BaseConfig
from stable_diffusion_pytorch_tpu.models.blocks import (
    CrossAttention,
    DownSample,
    GaussianDistribution,
    GroupNormSiLU,
    ResBlock,
    UpSample,
    conv1x1,
    conv3x3,
)
from stable_diffusion_pytorch_tpu.models.unet import (
    plan_input_blocks,
    plan_output_blocks,
)


@dataclass
class AutoencoderConfig(BaseConfig):
    """Flag surface mirrors /root/reference/stable_diffusion/models/autoencoder.py:22-48."""

    in_channels: int = field(
        default=3, metadata={"help": "Number of input channels of the input image."}
    )
    latent_channels: int = field(
        default=4, metadata={"help": "Embedding channels of the latent vector."}
    )
    out_channels: Optional[int] = field(
        default=3,
        metadata={
            "help": "Number of output channels of the decoded image. Should be the same as in_channels."
        },
    )
    autoencoder_channels_list: List[int] = field(
        default_factory=lambda: [64, 128],
        metadata={"help": "Comma-separated list of channel multipliers for each level."},
    )
    autoencoder_num_res_blocks: int = field(
        default=2, metadata={"help": "Number of residual blocks per level."}
    )
    groups: int = field(default=32, metadata={"help": "Number of groups for GroupNorm."})
    kl_weight: float = field(default=1.0, metadata={"help": "Weight of the KL loss."})


@struct.dataclass
class AutoEncoderKLOutput:
    """Facade matching the reference/diffusers `.latent_dist` access pattern
    (autoencoder.py:244-246)."""

    latent_dist: GaussianDistribution


class _Bottleneck(nn.Module):
    """ResBlock + raw CrossAttention + ResBlock (models/utils.py:100-131,
    use_attn_only=True path)."""

    channels: int
    groups: int
    first_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = ResBlock(
            groups=self.first_groups, dtype=self.dtype, name="res1"
        )(x, None, deterministic=deterministic)
        # NOTE: the reference's raw CrossAttention in the VAE bottleneck is NOT
        # residual (TimestepEmbedSequential just chains it, timestep_embedding.py:60-70)
        x = CrossAttention(
            query_dim=self.channels,
            n_heads=1,
            d_head=self.channels,
            dtype=self.dtype,
            name="attn",
        )(x, deterministic=deterministic)
        x = ResBlock(
            groups=self.groups, dtype=self.dtype, name="res2"
        )(x, None, deterministic=deterministic)
        return x


class Encoder(nn.Module):
    """autoencoder.py:164-199."""

    out_channels: int
    channels_list: Tuple[int, ...]
    num_res_blocks: int
    groups: int
    bottleneck_default_groups: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        ch0 = self.channels_list[0]
        x = conv3x3(ch0, dtype=self.dtype, name="conv_in")(x)
        plan, _, mid_ch, _, _ = plan_input_blocks(
            ch0, self.channels_list, self.num_res_blocks, None
        )
        for i, block in enumerate(plan):
            if block[0] == "res":
                _, _, oc, _ = block
                x = ResBlock(
                    out_channels=oc,
                    groups=self.groups,
                    dtype=self.dtype,
                    name=f"down_{i}_res",
                )(x, None, deterministic=deterministic)
            else:
                x = DownSample(dtype=self.dtype, name=f"down_{i}")(x)
        x = _Bottleneck(
            channels=mid_ch,
            groups=self.groups,
            first_groups=2 if self.bottleneck_default_groups else self.groups,
            dtype=self.dtype,
            name="bottleneck",
        )(x, deterministic=deterministic)
        x = GroupNormSiLU(self.groups, dtype=self.dtype, name="out_norm")(x)
        return conv3x3(2 * self.out_channels, dtype=self.dtype, name="out_conv")(x)


class Decoder(nn.Module):
    """autoencoder.py:202-241 — including the reference's reversed-channel quirk."""

    out_channels: int
    channels_list: Tuple[int, ...]
    num_res_blocks: int
    groups: int
    bottleneck_default_groups: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        ch0 = self.channels_list[0]
        x = conv3x3(ch0, dtype=self.dtype, name="conv_in")(x)
        x = _Bottleneck(
            channels=ch0,
            groups=self.groups,
            first_groups=2 if self.bottleneck_default_groups else self.groups,
            dtype=self.dtype,
            name="bottleneck",
        )(x, deterministic=deterministic)
        plan, _ = plan_output_blocks(
            self.channels_list, self.num_res_blocks, None, [], ch0, 0
        )
        for i, (_, _, oc, _, upsample) in enumerate(plan):
            x = ResBlock(
                out_channels=oc,
                groups=self.groups,
                dtype=self.dtype,
                name=f"up_{i}_res",
            )(x, None, deterministic=deterministic)
            if upsample:
                x = UpSample(dtype=self.dtype, name=f"up_{i}")(x)
        x = GroupNormSiLU(self.groups, dtype=self.dtype, name="out_norm")(x)
        return conv3x3(self.out_channels, dtype=self.dtype, name="out_conv")(x)


class AutoEncoderKL(nn.Module):
    """autoencoder.py:51-161."""

    in_channels: int = 3
    latent_channels: int = 4
    out_channels: Optional[int] = 3
    channels_list: Tuple[int, ...] = (64, 128)
    num_res_blocks: int = 2
    groups: int = 32
    bottleneck_default_groups: bool = False
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def add_autoencoder_args(parser):
        """DEPRECATED legacy argparse group (autoencoder.py:53-91); legacy
        defaults match the live ``AutoencoderConfig`` ones."""
        from stable_diffusion_pytorch_tpu.config import add_legacy_args

        return add_legacy_args(
            parser,
            AutoencoderConfig,
            "autoencoder",
            only=[
                "in_channels",
                "latent_channels",
                "out_channels",
                "autoencoder_channels_list",
                "autoencoder_num_res_blocks",
                "groups",
            ],
        )

    @classmethod
    def from_config(
        cls, cfg: AutoencoderConfig, compat=None, dtype: jnp.dtype = jnp.float32
    ) -> "AutoEncoderKL":
        assert cfg.out_channels is None or cfg.out_channels == cfg.in_channels, (
            f"input channels({cfg.in_channels}) should equal output channels({cfg.out_channels})"
        )
        return cls(
            in_channels=cfg.in_channels,
            latent_channels=cfg.latent_channels,
            out_channels=cfg.out_channels,
            channels_list=tuple(cfg.autoencoder_channels_list),
            num_res_blocks=cfg.autoencoder_num_res_blocks,
            groups=cfg.groups,
            bottleneck_default_groups=bool(
                compat and compat.bottleneck_default_groups
            ),
            dtype=dtype,
        )

    def setup(self) -> None:
        self.encoder = Encoder(
            out_channels=self.latent_channels,
            channels_list=self.channels_list,
            num_res_blocks=self.num_res_blocks,
            groups=self.groups,
            bottleneck_default_groups=self.bottleneck_default_groups,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            out_channels=self.out_channels or self.in_channels,
            channels_list=self.channels_list,
            num_res_blocks=self.num_res_blocks,
            groups=self.groups,
            bottleneck_default_groups=self.bottleneck_default_groups,
            dtype=self.dtype,
        )
        self.quant_conv = conv1x1(2 * self.latent_channels, dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = conv1x1(self.latent_channels, dtype=self.dtype, name="post_quant_conv")

    def encode(
        self, img: jnp.ndarray, deterministic: bool = True
    ) -> AutoEncoderKLOutput:
        """img [B,h,w,in_ch] -> posterior over [B,h/f,w/f,latent_ch]
        (autoencoder.py:132-146)."""
        z = self.encoder(img, deterministic=deterministic)
        moments = self.quant_conv(z)
        return AutoEncoderKLOutput(GaussianDistribution.from_moments(moments))

    def decode(self, latent: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """latent [B,h,w,latent_ch] -> image [B,H,W,out_ch] (autoencoder.py:148-161)."""
        assert latent.shape[-1] == self.latent_channels
        z = self.post_quant_conv(latent)
        return self.decoder(z, deterministic=deterministic)

    def __call__(
        self, img: jnp.ndarray, sample_key=None, deterministic: bool = True
    ):
        """Full encode->sample->decode pass (used for training / param init).

        Returns (reconstruction, posterior)."""
        posterior = self.encode(img, deterministic=deterministic)
        if sample_key is not None:
            z = posterior.latent_dist.sample(sample_key)
        else:
            z = posterior.latent_dist.mode()
        recon = self.decode(z, deterministic=deterministic)
        return recon, posterior

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.channels_list) - 1)
