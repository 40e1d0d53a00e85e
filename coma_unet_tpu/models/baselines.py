"""Baseline model family — JAX equivalents of the reference's comparison
suite (`validation.py:81-102,726-740`): the missing `unetr` module's
`GenUNETR` / `GenAttnUnet` / `AttnUNETR` (+ MONAI `UNet`). SwinUNETR variants
live in `models/swin.py`.

TPU notes: transformer blocks are pure MXU matmuls on [tokens, hidden]
tensors (well-tiled since hidden >= 256); the conv decoders reuse the NCDHW
blocks. LayerNorm/softmax in f32, matmuls bf16.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from coma_unet_tpu.models.blocks import (
    AttentionGate,
    ConvBlock,
    Convolution,
)

Dtype = object


# ---------------------------------------------------------------------------
# Plain residual 3D U-Net (MONAI `UNet` equivalent, `validation.py:92`)
# ---------------------------------------------------------------------------


class ResidualUnit(nn.Module):
    """MONAI ResidualUnit: conv->norm->act x2 with a (projected) residual."""

    out_channels: int
    strides: int = 1
    kernel_size: int = 3
    norm: str = "instance"
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        res = x
        y = Convolution(
            out_channels=self.out_channels, strides=self.strides,
            kernel_size=self.kernel_size, act="prelu", norm=self.norm,
            dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv0",
        )(x, train=train)
        y = Convolution(
            out_channels=self.out_channels, strides=1,
            kernel_size=self.kernel_size, act=None, norm=self.norm,
            dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv1",
        )(y, train=train)
        if res.shape != y.shape:
            res = Convolution(
                out_channels=self.out_channels, strides=self.strides,
                kernel_size=1, conv_only=True, dtype=self.dtype,
                param_dtype=self.param_dtype, name="residual",
            )(res, train=train)
        return y + res


class UNet3D(nn.Module):
    """Plain 3D U-Net: channels/strides like the flagship, residual units,
    no conditioning/attention — the `UNet` baseline."""

    channels: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (2, 2, 2, 2)
    out_channels: int = 1
    norm: str = "instance"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, covariate=None, roi_loc=None,
                 roi_std=None, roi_compact=None, train: bool = True):
        ch = list(self.channels)
        skips = []
        h = ResidualUnit(ch[0], strides=1, norm=self.norm, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head")(x, train)
        skips.append(h)
        for i in range(len(ch) - 1):
            h = ResidualUnit(
                ch[i + 1], strides=self.strides[i], norm=self.norm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"down{i}",
            )(h, train)
            if i < len(ch) - 2:
                skips.append(h)
        for i in range(len(ch) - 2, -1, -1):
            h = Convolution(
                out_channels=ch[i], strides=self.strides[i], kernel_size=3,
                is_transposed=True, act="prelu", norm=self.norm,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"up{i}",
            )(h, train=train)
            h = ResidualUnit(
                ch[i], strides=1, norm=self.norm, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"dec{i}",
            )(jnp.concatenate([h, skips[i]], axis=1), train)
        out = Convolution(
            out_channels=self.out_channels, kernel_size=1, conv_only=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="out",
        )(h, train=train)
        return jax.nn.relu(out.astype(jnp.float32))


# ---------------------------------------------------------------------------
# ViT encoder + UNETR
# ---------------------------------------------------------------------------


class MLPBlock(nn.Module):
    hidden: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = jax.nn.gelu(x)
        x = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(x)
        return x


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln2")(x)
        y = MLPBlock(int(d * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp")(y)
        return x + y


class ViT3D(nn.Module):
    """3D patch-embedding ViT returning hidden states at selected depths."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    extract_layers: Optional[Tuple[int, ...]] = None  # default: quarters
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        extract = self.extract_layers or tuple(
            max(1, (self.num_layers * q) // 4) for q in (1, 2, 3, 4)
        )
        p = self.patch_size
        b, c = x.shape[0], x.shape[1]
        grid = tuple(s // p for s in x.shape[2:])
        # patch embedding as a strided conv (one big matmul on the MXU)
        h = Convolution(
            out_channels=self.hidden_size, kernel_size=p, strides=p,
            conv_only=True, dtype=self.dtype, param_dtype=self.param_dtype,
            name="patch_embed",
        )(x.astype(self.dtype), train=train)  # [B, H, gd, gh, gw]
        tokens = h.reshape(b, self.hidden_size, -1).transpose(0, 2, 1)
        n = tokens.shape[1]
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, n, self.hidden_size), self.param_dtype,
        )
        tokens = tokens + pos.astype(tokens.dtype)
        outs = []
        for i in range(self.num_layers):
            tokens = TransformerBlock(
                num_heads=self.num_heads, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"block{i}",
            )(tokens)
            if (i + 1) in extract:
                outs.append(tokens)
        return outs, grid


def _tokens_to_volume(tokens: jnp.ndarray, grid: Tuple[int, int, int]) -> jnp.ndarray:
    b, n, d = tokens.shape
    return tokens.transpose(0, 2, 1).reshape(b, d, *grid)


class UNETR(nn.Module):
    """UNETR (Hatamizadeh et al.): ViT encoder + progressive deconv decoder
    with conv-projected skip connections; `attention_gates=True` gives the
    `AttnUNETR` variant (gated skips)."""

    out_channels: int = 1
    feature_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    attention_gates: bool = False
    norm: str = "instance"
    final_relu: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, covariate=None, roi_loc=None,
                 roi_std=None, roi_compact=None, train: bool = True):
        fs = self.feature_size
        hs, grid = ViT3D(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads, patch_size=self.patch_size,
            dtype=self.dtype, param_dtype=self.param_dtype, name="vit",
        )(x, train=train)
        z3, z6, z9, z12 = (_tokens_to_volume(t, grid) for t in hs)

        def deconv_stack(v, times, width, name):
            for t in range(times):
                v = Convolution(
                    out_channels=width, kernel_size=2, strides=2,
                    is_transposed=True, act="prelu", norm=self.norm,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"{name}_up{t}",
                )(v, train=train)
            return v

        # encoder skip projections (full res / 1/2 / 1/4 / 1/8)
        e0 = ConvBlock(out_channels=fs, strides=1, norm=self.norm,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="enc0")(x.astype(self.dtype), train=train)
        e1 = deconv_stack(z3, 3, fs * 2, "enc1")
        e2 = deconv_stack(z6, 2, fs * 4, "enc2")
        e3 = deconv_stack(z9, 1, fs * 8, "enc3")

        d = z12
        for i, (skip, width) in enumerate(
            ((e3, fs * 8), (e2, fs * 4), (e1, fs * 2), (e0, fs))
        ):
            d = Convolution(
                out_channels=width, kernel_size=2, strides=2,
                is_transposed=True, act="prelu", norm=self.norm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"dec{i}_up",
            )(d, train=train)
            if self.attention_gates:
                skip, _ = AttentionGate(
                    f_int=max(width // 2, 1), norm=self.norm,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"dec{i}_gate",
                )(d, skip, train=train)
            d = ConvBlock(
                out_channels=width, strides=1, norm=self.norm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"dec{i}_conv",
            )(jnp.concatenate([d, skip], axis=1), train=train)
        out = Convolution(
            out_channels=self.out_channels, kernel_size=1, conv_only=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="out",
        )(d, train=train)
        out = out.astype(jnp.float32)
        return jax.nn.relu(out) if self.final_relu else out
