"""SwinUNETR-family baselines (`SwinUnetr` / `AttnSwinUnetr`,
`validation.py:90-91,735-737`): a 3D shifted-window (Swin) transformer
encoder with a UNETR-style conv decoder; `attention_gates=True` gates the
skips.

TPU notes: window attention is batched matmuls over [num_windows, w^3, C]
tensors — w^3 tokens (64 for w=4) x C>=48 keeps the MXU fed; the shifted-
window masks and relative-position-bias indices are precomputed static
tables. LayerNorm/softmax in f32, matmuls bf16.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coma_unet_tpu.models.blocks import AttentionGate, ConvBlock, Convolution

Dtype = object


@lru_cache(maxsize=8)
def _rel_pos_index(w: int) -> np.ndarray:
    """Relative position index table for a w^3 window: [w^3, w^3] ints in
    [0, (2w-1)^3)."""
    coords = np.stack(
        np.meshgrid(np.arange(w), np.arange(w), np.arange(w), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    rel = coords[:, None, :] - coords[None, :, :] + (w - 1)
    return (
        rel[..., 0] * (2 * w - 1) ** 2 + rel[..., 1] * (2 * w - 1) + rel[..., 2]
    ).astype(np.int32)


@lru_cache(maxsize=32)
def _shift_mask(d: int, h: int, wdim: int, w: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: [num_windows, w^3, w^3] with 0 for
    allowed pairs and -inf for pairs crossing the roll boundary."""
    img = np.zeros((d, h, wdim), np.int32)
    cnt = 0
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for sd in slices:
        for sh in slices:
            for sw in slices:
                img[sd, sh, sw] = cnt
                cnt += 1
    win = (
        img.reshape(d // w, w, h // w, w, wdim // w, w)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(-1, w**3)
    )
    mask = (win[:, None, :] != win[:, :, None]).astype(np.float32) * -1e9
    return mask


class WindowAttention(nn.Module):
    num_heads: int
    window: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        # x: [nw, n, c]
        nw, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(nw, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum(
            "whnd,whmd->whnm", q, k
        ).astype(jnp.float32) / np.sqrt(head_dim)
        bias_table = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 3, self.num_heads), self.param_dtype,
        )
        idx = jnp.asarray(_rel_pos_index(self.window))
        attn = attn + bias_table[idx].transpose(2, 0, 1)[None]
        if mask is not None:
            attn = attn + mask[:, None, :, :]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("whnm,whmd->whnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")(out)


class SwinBlock3D(nn.Module):
    num_heads: int
    window: int
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, D, H, W, C] channels-last token grid
        b, d, h, wd, c = x.shape
        w = self.window
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln1")(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift, -self.shift), (1, 2, 3))
            mask = jnp.asarray(_shift_mask(d, h, wd, w, self.shift))
            mask = jnp.tile(mask, (b, 1, 1))
        else:
            mask = None
        win = (
            y.reshape(b, d // w, w, h // w, w, wd // w, w, c)
            .transpose(0, 1, 3, 5, 2, 4, 6, 7)
            .reshape(-1, w**3, c)
        )
        win = WindowAttention(
            num_heads=self.num_heads, window=w, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn",
        )(win.astype(self.dtype), mask)
        y = (
            win.reshape(b, d // w, h // w, wd // w, w, w, w, c)
            .transpose(0, 1, 4, 2, 5, 3, 6, 7)
            .reshape(b, d, h, wd, c)
        )
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift, self.shift), (1, 2, 3))
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(y)
        y = jax.nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(y)
        return x + y


class PatchMerging3D(nn.Module):
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, h, w, c = x.shape
        x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, d // 2, h // 2, w // 2, 8 * c
        )
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln")(x)
        return nn.Dense(2 * c, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="reduce")(x)


class SwinEncoder3D(nn.Module):
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 4
    patch_size: int = 2
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        # x: [B, C, D, H, W] -> stages of channels-last token grids
        p = self.patch_size
        h = Convolution(
            out_channels=self.embed_dim, kernel_size=p, strides=p,
            conv_only=True, dtype=self.dtype, param_dtype=self.param_dtype,
            name="patch_embed",
        )(x.astype(self.dtype), train=train)
        t = jnp.moveaxis(h, 1, -1)  # [B, D, H, W, C]
        feats = []
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for i in range(depth):
                shift = 0 if i % 2 == 0 else self.window // 2
                # window must divide the grid; shrink if needed
                w = self.window
                while t.shape[1] % w != 0 or w > t.shape[1]:
                    w //= 2
                t = SwinBlock3D(
                    num_heads=heads, window=max(w, 1),
                    shift=shift if w > 1 and shift < w else 0,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"stage{s}_block{i}",
                )(t)
            feats.append(jnp.moveaxis(t, -1, 1))  # NCDHW
            if s < len(self.depths) - 1:
                t = PatchMerging3D(dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"merge{s}")(t)
        return feats


class SwinUNETR(nn.Module):
    """Swin encoder + UNETR-style decoder. feats resolutions (patch 2):
    1/2, 1/4, 1/8, 1/16 of input; decoder upsamples back with skips."""

    out_channels: int = 1
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 4
    attention_gates: bool = False
    norm: str = "instance"
    final_relu: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, covariate=None, roi_loc=None,
                 roi_std=None, roi_compact=None, train: bool = True):
        feats = SwinEncoder3D(
            embed_dim=self.embed_dim, depths=self.depths,
            num_heads=self.num_heads, window=self.window, dtype=self.dtype,
            param_dtype=self.param_dtype, name="swin",
        )(x, train=train)
        e_in = ConvBlock(
            out_channels=self.embed_dim, strides=1, norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="enc_in",
        )(x.astype(self.dtype), train=train)

        d = feats[-1]
        skips = [e_in] + feats[:-1]
        widths = [self.embed_dim] + [f.shape[1] for f in feats[:-1]]
        for i in range(len(skips) - 1, -1, -1):
            skip = skips[i]
            width = widths[i]
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
