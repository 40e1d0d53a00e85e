"""Model registry — the factory behind `-model_type`
(`validation.py:81-102`): ContraAttnUNET (flagship), GenAttnUnet/AttnUNET
(plain attention U-Net), UNET, GenUNETR, AttnUNETR, SwinUnetr, AttnSwinUnetr.

All models share the forward signature
    model.apply(vars, mri, covars, roi_loc, roi_std, roi_compact, train=...)
so the train/eval/infer engines are model-agnostic (the baselines ignore the
covariate/prediction inputs, like the reference's non-contrastive `test`
path, `attn_unet_data_parallel.py:1400-1549`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from coma_unet_tpu.config import ModelConfig
from coma_unet_tpu.models.attention_unet import AttentionUNet
from coma_unet_tpu.models.baselines import UNet3D, UNETR
from coma_unet_tpu.models.contra import ContraAttnUNet
from coma_unet_tpu.models.swin import SwinUNETR


class PlainAttentionUNet(nn.Module):
    """`GenAttnUnet` / non-contrastive `AttnUNET`: the attention U-Net
    backbone with a plain ReLU output head (no projection heads/modulator)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, covariate=None, roi_loc=None, roi_std=None,
                 roi_compact=None, train: bool = True):
        feats = AttentionUNet(self.config, name="unet")(x, covariate,
                                                        train=train)
        return jax.nn.relu(feats.out.astype(jnp.float32))


MODEL_TYPES = (
    "ContraAttnUNET", "AttnUNET", "GenAttnUnet", "UNET",
    "GenUNETR", "AttnUNETR", "SwinUnetr", "AttnSwinUnetr",
)


def build_model(model_type: str, config: Optional[ModelConfig] = None) -> Any:
    cfg = config or ModelConfig()
    dtype = jnp.dtype(cfg.compute_dtype)
    pdtype = jnp.dtype(cfg.param_dtype)
    if model_type == "ContraAttnUNET":
        return ContraAttnUNet(cfg)
    if model_type in ("AttnUNET", "GenAttnUnet"):
        return PlainAttentionUNet(cfg)
    if model_type == "UNET":
        return UNet3D(
            channels=cfg.channels, strides=cfg.strides[:-1],
            out_channels=cfg.out_channels, norm=cfg.norm, dtype=dtype,
            param_dtype=pdtype,
        )
    if model_type in ("GenUNETR", "AttnUNETR"):
        return UNETR(
            out_channels=cfg.out_channels,
            attention_gates=model_type == "AttnUNETR", norm=cfg.norm,
            dtype=dtype, param_dtype=pdtype,
        )
    if model_type in ("SwinUnetr", "AttnSwinUnetr"):
        return SwinUNETR(
            out_channels=cfg.out_channels,
            attention_gates=model_type == "AttnSwinUnetr", norm=cfg.norm,
            dtype=dtype, param_dtype=pdtype,
        )
    raise ValueError(
        f"unknown model_type {model_type!r}; choose from {MODEL_TYPES}"
    )
