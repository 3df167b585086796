"""ControlNet (Zhang et al. 2023, "Adding Conditional Control to Text-to-Image
Diffusion Models") — TPU-native Flax implementation.

No counterpart in /root/reference — capability extension (ecosystem analog:
diffusers ControlNetModel). Architecture: a trainable copy of the UNet
*encoder* (conv_in + input blocks + bottleneck; the plans in models/unet.py)
conditioned on a spatial hint image (edges, pose, depth, ...). Every skip
feature and the bottleneck output pass through a zero-initialized 1x1 conv and
are ADDED to the frozen UNet's corresponding skip/bottleneck features
(UNetModel's ``control`` argument). Zero init makes step 0 an exact no-op, so
training starts from the frozen model's behavior.

Because the encoder mirrors the UNet layer names exactly (conv_in, time_fc1/2,
in_{i}_res / in_{i}_attn / in_{i}_down, mid_res1 / mid_attn / mid_res2),
``init_controlnet_from_unet`` transplants a trained UNet's encoder weights as
the paper prescribes.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from stable_diffusion_pytorch_tpu.models.blocks import (
    DownSample,
    ResBlock,
    SpatialTransformer,
    conv1x1,
    conv3x3,
    sinusoidal_time_proj,
)
from stable_diffusion_pytorch_tpu.models.unet import plan_input_blocks

Dtype = jnp.dtype


class HintEmbedding(nn.Module):
    """Pixel-space hint [B, H, W, hint_channels] -> latent-res feature map
    [B, H/2^n, W/2^n, out_ch]. The paper's 4-layer SiLU conv stack
    (16-32-96-256) with a zero-init output conv; ``downsamples`` stride-2
    convs bridge the pixel->latent resolution gap (3 for the SD-1.5 VAE)."""

    out_channels: int
    downsamples: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hint: jnp.ndarray) -> jnp.ndarray:
        widths = [16, 32, 96, 256]
        x = conv3x3(widths[0], dtype=self.dtype, name="conv_in")(hint)
        x = nn.silu(x)
        for i in range(self.downsamples):
            w = widths[min(i + 1, len(widths) - 1)]
            x = conv3x3(w, dtype=self.dtype, name=f"conv_pre_{i}")(x)
            x = nn.silu(x)
            x = conv3x3(w, stride=2, dtype=self.dtype, name=f"conv_down_{i}")(x)
            x = nn.silu(x)
        return conv3x3(
            self.out_channels, zero_init=True, dtype=self.dtype, name="conv_out"
        )(x)


class ControlNet(nn.Module):
    """UNet-encoder copy + hint embedding + zero convs. Returns the residual
    pytree UNetModel consumes: ``(skip_residuals tuple, mid_residual)``."""

    latent_channels: int
    groups: int
    num_res_blocks: int = 2
    n_heads: int = 8
    attention_resolutions: Tuple[int, ...] = (0, 1)
    channels_list: Tuple[int, ...] = (160, 320)
    time_emb_dim: Optional[int] = 512
    dropout: float = 0.1
    n_layers: int = 2
    context_dim: int = 768
    hint_channels: int = 3
    hint_downsamples: int = 3
    flipped_time_embedding: bool = False
    dtype: Dtype = jnp.float32

    @classmethod
    def from_unet_config(
        cls, latent_channels, groups, cfg, hint_downsamples: int = 3,
        compat=None, dtype: Dtype = jnp.float32,
    ) -> "ControlNet":
        """Mirror UNetModel.from_config (models/unet.py:180-207) so the encoder
        copy matches the UNet it controls."""
        return cls(
            latent_channels=latent_channels,
            groups=groups,
            num_res_blocks=cfg.num_res_blocks,
            n_heads=cfg.n_heads,
            attention_resolutions=tuple(cfg.attention_resolutions),
            channels_list=tuple(cfg.channels_list),
            time_emb_dim=cfg.time_emb_dim,
            dropout=cfg.dropout,
            n_layers=cfg.n_layers,
            context_dim=cfg.context_dim,
            hint_downsamples=hint_downsamples,
            flipped_time_embedding=bool(compat and compat.flipped_time_embedding),
            dtype=dtype,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context_emb: Optional[jnp.ndarray] = None,
        hint: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """x: [B, h, w, latent_channels]; hint: [B, h*2^n, w*2^n, hint_ch]."""
        assert hint is not None, "ControlNet needs the conditioning hint image"
        ch0 = self.channels_list[0]
        t_dim = self.time_emb_dim or ch0 * 4

        t_emb = sinusoidal_time_proj(
            timesteps, ch0, flipped=self.flipped_time_embedding
        ).astype(self.dtype)
        t_emb = nn.Dense(t_dim, dtype=self.dtype, param_dtype=jnp.float32, name="time_fc1")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(t_dim, dtype=self.dtype, param_dtype=jnp.float32, name="time_fc2")(t_emb)

        in_plan, _, mid_ch, d_head_src, _ = plan_input_blocks(
            ch0, self.channels_list, self.num_res_blocks, self.attention_resolutions
        )

        x = conv3x3(ch0, dtype=self.dtype, name="conv_in")(x)
        x = x + HintEmbedding(
            ch0, downsamples=self.hint_downsamples, dtype=self.dtype,
            name="hint_embedding",
        )(hint.astype(self.dtype))

        residuals = [
            conv1x1(ch0, zero_init=True, dtype=self.dtype, name="zero_conv_0")(x)
        ]
        for i, block in enumerate(in_plan):
            if block[0] == "res":
                _, _, oc, attn = block
                x = ResBlock(
                    out_channels=oc,
                    time_emb_dim=t_dim,
                    groups=self.groups,
                    dtype=self.dtype,
                    name=f"in_{i}_res",
                )(x, t_emb, deterministic)
                if attn:
                    x = SpatialTransformer(
                        in_channels=oc,
                        n_heads=self.n_heads,
                        d_head=oc // self.n_heads,
                        n_layers=self.n_layers,
                        dropout=self.dropout,
                        context_dim=self.context_dim,
                        groups=self.groups,
                        dtype=self.dtype,
                        name=f"in_{i}_attn",
                    )(x, context_emb, deterministic)
            else:
                x = DownSample(dtype=self.dtype, name=f"in_{i}_down")(x)
            residuals.append(
                conv1x1(
                    x.shape[-1], zero_init=True, dtype=self.dtype,
                    name=f"zero_conv_{i + 1}",
                )(x)
            )

        # bottleneck mirrors UNetModel incl. the inherited d_head quirk
        # (models/unet.py:297-331)
        d_head = (
            d_head_src // self.n_heads if d_head_src else mid_ch // self.n_heads
        )
        x = ResBlock(
            time_emb_dim=t_dim,
            dropout=self.dropout,
            groups=self.groups,
            dtype=self.dtype,
            name="mid_res1",
        )(x, t_emb, deterministic)
        x = SpatialTransformer(
            in_channels=mid_ch,
            n_heads=self.n_heads,
            d_head=d_head,
            n_layers=self.n_layers,
            dropout=self.dropout,
            context_dim=self.context_dim,
            groups=self.groups,
            dtype=self.dtype,
            name="mid_attn",
        )(x, context_emb, deterministic)
        x = ResBlock(
            time_emb_dim=t_dim,
            dropout=self.dropout,
            groups=self.groups,
            dtype=self.dtype,
            name="mid_res2",
        )(x, t_emb, deterministic)
        mid = conv1x1(
            mid_ch, zero_init=True, dtype=self.dtype, name="zero_conv_mid"
        )(x)
        return tuple(residuals), mid


class ControlledUNetModel(nn.Module):
    """UNet + ControlNet composed under ONE param tree:
    ``{"params": {"unet": ..., "controlnet": ...}}``. Signature matches
    UNetModel with an extra ``hint``; ``control_scale`` scales the injected
    residuals (0 = frozen base model exactly)."""

    unet: nn.Module
    controlnet: ControlNet

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context_emb: Optional[jnp.ndarray] = None,
        hint: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        control_scale: float = 1.0,
    ) -> jnp.ndarray:
        skips, mid = self.controlnet(
            x, timesteps, context_emb, hint, deterministic
        )
        if control_scale != 1.0:
            s = jnp.asarray(control_scale, mid.dtype)
            skips = tuple(r * s for r in skips)
            mid = mid * s
        return self.unet(
            x, timesteps, context_emb, deterministic, control=(skips, mid)
        )


def init_controlnet_from_unet(unet_params, controlnet_params):
    """Transplant the trained UNet's encoder weights into a freshly initialized
    ControlNet (Zhang et al. 2023 §3.2: the control branch starts as a copy of
    the locked model). Leaves with no UNet counterpart (hint embedding, zero
    convs) keep their fresh init."""
    import jax

    up = unet_params["params"] if "params" in unet_params else unet_params
    cp = controlnet_params["params"] if "params" in controlnet_params else controlnet_params
    out = dict(cp)
    for name in cp:
        if name in up:
            # deep-copy: the trainable copy must NOT alias the frozen UNet's
            # buffers (the train step donates its state; an aliased leaf would
            # appear as both donated and live input in one Execute call)
            out[name] = jax.tree_util.tree_map(jnp.array, up[name])
    return {"params": out}
