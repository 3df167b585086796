"""Core Flax building blocks for the UNet and VAE, in NHWC (channel-last) layout.

TPU-native re-design of the reference torch modules:
- ResBlock / UpSample / DownSample   (/root/reference/stable_diffusion/modules/resnet2d.py)
- CrossAttention / FeedForward / GEGLU / BasicTransformerBlock / SpatialTransformer
  (/root/reference/stable_diffusion/modules/transformer.py)
- sinusoidal_time_proj               (/root/reference/stable_diffusion/modules/timestep_embedding.py:73-105)
- GaussianDistribution               (/root/reference/stable_diffusion/modules/distributions.py)

Design notes (TPU-first, not a translation):
- NHWC everywhere: XLA's TPU conv lowering prefers channel-last; the public CLI
  boundary converts from/to NCHW images.
- All convs use explicit padding ((1,1),(1,1)) so outputs match torch ``padding=1``
  bit-for-bit including strided cases (XLA 'SAME' anchors differently for stride 2).
- DownSample: the reference does conv(stride=1) then nearest-interp x0.5
  (resnet2d.py:122-123). Nearest x0.5 keeps exactly the even-indexed outputs, and a
  stride-2 conv with padding (1,1) computes exactly those windows — so the strided
  conv here is numerically identical and avoids computing (then discarding) half
  the rows/cols.
- GroupNorm+SiLU goes through ops.groupnorm so it can be served by a fused Pallas
  kernel; attention goes through ops.attention for the flash kernel.
- Dropout/sampling take explicit PRNG via flax's rng collections.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct
from jax.ad_checkpoint import checkpoint_name

from stable_diffusion_pytorch_tpu.ops.attention import multi_head_attention
from stable_diffusion_pytorch_tpu.ops.groupnorm import group_norm, group_norm_cat

Dtype = jnp.dtype

# torch nn.Linear/Conv2d default init: kaiming_uniform(a=sqrt(5)) == uniform
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)); we use flax defaults (lecun_normal) since no
# checkpoint-level init parity is required, but zero-init positions are preserved.
zeros_init = nn.initializers.zeros


def sinusoidal_time_proj(
    time_steps: jnp.ndarray,
    emb_dim: int,
    max_len: int = 10000,
    flipped: bool = False,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding -> [batch, emb_dim] (f32).

    ``flipped=False`` (default) is the standard transformer embedding with
    descending frequencies ``exp(-log(max_len) * i / half)``. ``flipped=True``
    reproduces the reference's sign-flipped variant
    (timestep_embedding.py:93-99) for numeric parity runs.
    """
    half = emb_dim // 2
    sign = 1.0 if flipped else -1.0
    freq = jnp.exp(
        sign * math.log(max_len) / half * jnp.arange(half, dtype=jnp.float32)
    )
    args = time_steps.astype(jnp.float32)[:, None] * freq[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


@struct.dataclass
class GaussianDistribution:
    """Diagonal Gaussian posterior over channel-last latents.

    Counterpart of modules/distributions.py:5-19 with explicit PRNG: ``moments``
    is [B, h, w, 2*C] chunked along the channel axis into (mean, log_var).
    """

    mean: jnp.ndarray
    log_var: jnp.ndarray

    @classmethod
    def from_moments(cls, moments: jnp.ndarray) -> "GaussianDistribution":
        mean, log_var = jnp.split(moments, 2, axis=-1)
        return cls(mean=mean, log_var=log_var)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.log_var)
        eps = jax.random.normal(key, std.shape, std.dtype)
        return self.mean + eps * std

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        """KL(q || N(0, I)) summed over spatial+channel dims -> [batch]
        (distributions.py:15-19)."""
        mean = self.mean.astype(jnp.float32)
        log_var = self.log_var.astype(jnp.float32)
        var = jnp.exp(log_var)
        return 0.5 * jnp.sum(
            mean**2 + var - 1.0 - log_var, axis=tuple(range(1, mean.ndim))
        )


class GroupNormSiLU(nn.Module):
    """GroupNorm with optional fused SiLU, dispatched through ops.groupnorm.

    Passing ``skip_cat`` normalizes the VIRTUAL concat(x, skip_cat) along
    channels (joint group statistics) without materializing the raw concat —
    parameters are identical to the plain module at the concatenated width,
    so checkpoints/converters are unaffected.
    """

    num_groups: int
    apply_silu: bool = True
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip_cat: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = x.shape[-1] + (skip_cat.shape[-1] if skip_cat is not None else 0)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", zeros_init, (c,), jnp.float32)
        if skip_cat is not None:
            return group_norm_cat(
                x, skip_cat, scale, bias, self.num_groups, self.eps,
                apply_silu=self.apply_silu,
            )
        return group_norm(
            x, scale, bias, self.num_groups, self.eps, apply_silu=self.apply_silu
        )


def conv3x3(
    features: int,
    stride: int = 1,
    zero_init: bool = False,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """3x3 conv with torch-style explicit padding=1."""
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        kernel_init=zeros_init if zero_init else nn.initializers.lecun_normal(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def conv1x1(
    features: int,
    zero_init: bool = False,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        kernel_init=zeros_init if zero_init else nn.initializers.lecun_normal(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class _ConvParams(nn.Module):
    """Holds a canonical [kh, kw, C_in, C_out] conv kernel + bias under the
    same param names nn.Conv would create (so checkpoints/converters are
    unchanged) while letting the caller apply the weights in a transformed
    form (phase-decomposed UpSample, split-residual skip_cat)."""

    features: int
    kernel_hw: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_hw + (in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", zeros_init, (self.features,), jnp.float32)
        return kernel, bias


# phase collapse matrices: nearest-up duplicates each source row/col, so for
# output phase d the three 3x3 kernel taps land on two source rows as
# A_0 = [[1,0,0],[0,1,1]], A_1 = [[1,1,0],[0,0,1]] (identically for columns)
_PHASE_A = np.array(
    [[[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]], [[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]],
    np.float32,
)


class UpSample(nn.Module):
    """Nearest x2 upsample + 3x3 conv (resnet2d.py:9-63).

    Computed via the exact phase decomposition: nearest-up duplicates every
    source pixel 2x2, so the 3x3 conv over the upsampled map re-multiplies the
    same inputs — collapsing duplicated taps gives ONE 2x2 conv producing 4
    output phases that are interleaved back. 16 tap-multiplies per source
    pixel instead of 36 (44% of the FLOPs) and no [2H, 2W] nearest-upsampled
    input materialization. Identical math up to float associativity (adjacent
    kernel taps are pre-summed in f32). ``scale_factor != 2`` falls back to
    the direct path.
    """

    out_channels: Optional[int] = None
    scale_factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        out_ch = self.out_channels or c
        if self.scale_factor != 2:
            x = jnp.repeat(
                jnp.repeat(x, self.scale_factor, axis=1), self.scale_factor, axis=2
            )
            return conv3x3(out_ch, dtype=self.dtype, name="conv")(x)

        kernel, bias = _ConvParams(out_ch, name="conv")(c)
        a = jnp.asarray(_PHASE_A)
        # [2(p), 2(q), C_in, 2(di), 2(dj), C_out] — phase kernels in f32
        k4 = jnp.einsum("dpk,eql,klio->pqideo", a, a, kernel)
        k4 = k4.reshape(2, 2, c, 4 * out_ch).astype(self.dtype)

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k4,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [B, H+1, W+1, 4*C_out]
        out = out.reshape(b, h + 1, w + 1, 2, 2, out_ch)
        # interleave phases: y[b, 2i+di, 2j+dj] = out[b, i+di, j+dj, di, dj]
        rows = []
        for di in range(2):
            cols = [
                out[:, di : h + di, dj : w + dj, di, dj, :] for dj in range(2)
            ]
            rows.append(jnp.stack(cols, axis=3))  # [B, H, W, 2, C]
        y = jnp.stack(rows, axis=2)  # [B, H, 2, W, 2, C]
        y = y.reshape(b, 2 * h, 2 * w, out_ch)
        return (y + bias.astype(self.dtype)).astype(self.dtype)


class DownSample(nn.Module):
    """Stride-2 3x3 conv; numerically identical to the reference's
    conv(stride=1) + nearest-interp x0.5 (resnet2d.py:103-123) for even H/W —
    see module docstring proof — but does half the FLOPs."""

    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.out_channels or x.shape[-1]
        return conv3x3(out_ch, stride=2, dtype=self.dtype, name="conv")(x)


class ResBlock(nn.Module):
    """GN+SiLU+Conv / +time-MLP / GN+SiLU+Dropout+zero-Conv, 1x1-conv skip
    (resnet2d.py:127-238).

    ``skip_cat``: a second input concatenated channel-wise AFTER ``x`` — the
    UNet up-path skip connection (/root/reference/stable_diffusion/models/
    unet.py:306-309). The concat is handled VIRTUALLY: the opening GroupNorm
    computes joint statistics from the two parts (group_norm_cat writes the
    normalized concat the in_conv consumes — the raw concat never exists in
    HBM), and the 1x1 residual conv applies its kernel in split form
    (conv(cat(x,s), W) == x @ W[:C1] + s @ W[C1:], exact). Parameters are
    identical to concatenating first, so checkpoints/converters see no
    difference.
    """

    out_channels: Optional[int] = None
    time_emb_dim: Optional[int] = None
    dropout: float = 0.0
    groups: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        skip_cat: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c1 = x.shape[-1]
        in_ch = c1 + (skip_cat.shape[-1] if skip_cat is not None else 0)
        out_ch = self.out_channels or in_ch
        assert in_ch % self.groups == 0, (
            f"in_channels({in_ch}) must be divisible by groups({self.groups})"
        )

        h = GroupNormSiLU(self.groups, dtype=self.dtype, name="in_norm")(
            x, skip_cat
        )
        h = conv3x3(out_ch, dtype=self.dtype, name="in_conv")(h)
        # checkpoint_name: a no-op outside jax.checkpoint; under the UNet's
        # remat="conv-save" policy the conv outputs (the FLOP-heavy ops) are
        # SAVED while GN/SiLU/attention activations are rematerialized
        h = checkpoint_name(h, "resblock_conv")

        if self.time_emb_dim is not None and time_emb is not None:
            t = jax.nn.silu(time_emb.astype(self.dtype))
            t = nn.Dense(
                out_ch, dtype=self.dtype, param_dtype=jnp.float32, name="time_proj"
            )(t)
            h = h + t[:, None, None, :]

        h = GroupNormSiLU(self.groups, dtype=self.dtype, name="out_norm")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv3x3(out_ch, zero_init=True, dtype=self.dtype, name="out_conv")(h)
        h = checkpoint_name(h, "resblock_conv")

        if skip_cat is None:
            if in_ch != out_ch:
                x = conv1x1(out_ch, dtype=self.dtype, name="skip")(x)
            return h + x
        if in_ch != out_ch:
            kernel, kbias = _ConvParams(
                out_ch, kernel_hw=(1, 1), name="skip"
            )(in_ch)
            kernel = kernel[0, 0].astype(self.dtype)  # [C_in, C_out]
            res = (
                jnp.dot(x.astype(self.dtype), kernel[:c1])
                + jnp.dot(skip_cat.astype(self.dtype), kernel[c1:])
                + kbias.astype(self.dtype)
            )
            return h + res
        # identity residual at equal width: fold the adds into the output
        # write instead of building the raw concat first
        return jnp.concatenate(
            [h[..., :c1] + x, h[..., c1:] + skip_cat], axis=-1
        )


class _DenseKernel(nn.Module):
    """A bias-free Dense's parameter (same tree: {name: {kernel}}) without the
    apply — lets self-attention fuse Q/K/V into one matmul at apply time while
    keeping the canonical per-projection checkpoint layout."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )


class CrossAttention(nn.Module):
    """Multi-head cross/self attention (transformer.py:18-119).

    Accepts [B, N, C] tokens or [B, H, W, C] feature maps (auto-flattened, matching
    the reference's 4-D auto-rearrange used by the VAE bottleneck,
    transformer.py:85-88). The score/softmax/value product is served by
    ops.attention (flash kernel on TPU).
    """

    query_dim: int
    context_dim: Optional[int] = None
    n_heads: int = 1
    d_head: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        context_emb: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        convert = query.ndim == 4
        if convert:
            b, hh, ww, c = query.shape
            query = query.reshape(b, hh * ww, c)
        self_attention = context_emb is None
        if self_attention:
            context_emb = query

        d_model = self.n_heads * self.d_head
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        if self_attention:
            # fused QKV: one [C, 3*d_model] matmul reads the (large) token
            # tensor once instead of three times; parameters stay the separate
            # to_q/to_k/to_v kernels (checkpoint/converter layout unchanged),
            # concatenated at apply time (loop-invariant, hoisted by XLA)
            in_ch = query.shape[-1]
            wq = _DenseKernel(d_model, name="to_q")(in_ch)
            wk = _DenseKernel(d_model, name="to_k")(in_ch)
            wv = _DenseKernel(d_model, name="to_v")(in_ch)
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            qkv = jnp.dot(query.astype(self.dtype), w)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(d_model, "to_q")(query)
            k = dense(d_model, "to_k")(context_emb)
            v = dense(d_model, "to_v")(context_emb)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.n_heads, self.d_head)
        k = k.reshape(b, m, self.n_heads, self.d_head)
        v = v.reshape(b, m, self.n_heads, self.d_head)

        out = multi_head_attention(q, k, v, scale=1.0 / math.sqrt(self.d_head), mask=mask)
        out = out.reshape(b, n, d_model)
        out = nn.Dense(
            self.query_dim, dtype=self.dtype, param_dtype=jnp.float32, name="out"
        )(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if convert:
            out = out.reshape(b, hh, ww, self.query_dim)
        return out


class GEGLU(nn.Module):
    """GeGLU(x) = (xW + b) * GELU(xV + c) (transformer.py:158-192)."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        proj = nn.Dense(
            self.out_features * 2, dtype=self.dtype, param_dtype=jnp.float32, name="proj"
        )(x)
        x, gate = jnp.split(proj, 2, axis=-1)
        # torch nn.GELU() default is the exact (erf) formulation
        return x * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU -> Dropout -> Linear (transformer.py:122-155)."""

    d_model: int
    dim_mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = GEGLU(self.dim_mult * self.d_model, dtype=self.dtype, name="geglu")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="out"
        )(x)


class BasicTransformerBlock(nn.Module):
    """POST-norm block: norm(x + sublayer(x)), self -> cross -> ffn, exactly the
    reference's (nonstandard) ordering (transformer.py:274-278)."""

    d_model: int
    n_heads: int
    d_head: int
    dropout: float = 0.0
    context_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        x = ln("norm1")(
            x
            + CrossAttention(
                self.d_model,
                context_dim=self.d_model,
                n_heads=self.n_heads,
                d_head=self.d_head,
                dropout=self.dropout,
                dtype=self.dtype,
                name="self_attn",
            )(x, context_emb=None, deterministic=deterministic)
        )
        x = ln("norm2")(
            x
            + CrossAttention(
                self.d_model,
                context_dim=self.context_dim,
                n_heads=self.n_heads,
                d_head=self.d_head,
                dropout=self.dropout,
                dtype=self.dtype,
                name="cross_attn",
            )(x, context_emb=context_emb, deterministic=deterministic)
        )
        x = ln("norm3")(
            x
            + FeedForward(
                self.d_model, dropout=self.dropout, dtype=self.dtype, name="ffn"
            )(x, deterministic=deterministic)
        )
        return x


class SpatialTransformer(nn.Module):
    """GN -> 1x1 proj_in -> flatten (b, h*w, c) -> transformer blocks -> 1x1
    zero-init proj_out -> residual (transformer.py:282-383)."""

    in_channels: int
    n_heads: int
    d_head: int
    n_layers: int = 1
    dropout: float = 0.0
    context_dim: Optional[int] = None
    groups: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert x.shape[-1] == self.in_channels
        b, h, w, c = x.shape
        x_in = x
        x = GroupNormSiLU(
            self.groups, apply_silu=False, dtype=self.dtype, name="norm"
        )(x)
        x = conv1x1(self.in_channels, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.n_layers):
            x = BasicTransformerBlock(
                self.in_channels,
                self.n_heads,
                self.d_head,
                dropout=self.dropout,
                context_dim=self.context_dim,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, context_emb=context_emb, deterministic=deterministic)
        x = x.reshape(b, h, w, c)
        x = conv1x1(self.in_channels, zero_init=True, dtype=self.dtype, name="proj_out")(x)
        return x + x_in
