"""ContraAttnUNet — the flagship covariate-modulated contrastive model.

Rebuild of `ContrastiveAttentionUNET_DP` (`attn_unet_data_parallel.py:503-693`):
the attention U-Net backbone plus
  * per-level contrastive projection heads (ref :530-535),
  * a final projection head (pool -> dense -> relu, ref :537-541),
  * learned pos/neg/general full-volume dynamic prompts (ref :544-545,610),
  * the UQ modulator head (`forward_modulator_with_uq`, ref :630-658): paints
    per-ROI predicted tau mean ('loc') and std volumes from upstream
    CatBoost/NGBoost predictions and fuses them with the prompts and the
    U-Net output through small conv stacks.

TPU-native deltas from the reference:
  * The per-sample Python loop over 36 ROIs with `.item()` host syncs
    (ref :637-644) becomes a single gather (`paint_roi_values`) from
    host-precomputed [B, R] loc/std arrays — static shapes, fully jittable.
  * The reference invokes the full U-Net forward twice back-to-back
    (ref :664-666, a bug doubling compute); we run it once.
  * Outputs are a typed struct, not mode-dependent tuples.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from coma_unet_tpu.config import ModelConfig
from coma_unet_tpu.models.attention_unet import AttentionUNet, UNetFeatures
from coma_unet_tpu.models.blocks import (
    Convolution,
    ProjectionHead,
    StackedFusionConvLayers,
)
from coma_unet_tpu.ops.roi import paint_roi_values


@flax.struct.dataclass
class ContraOutputs:
    out: jnp.ndarray                          # synthesized volume [B,1,D,H,W]
    projections: Tuple[jnp.ndarray, ...]      # per-level [B, Ni] embeddings
    final_projection: jnp.ndarray             # [B, latent]
    encoder: Tuple[jnp.ndarray, ...]          # encoder features (embeddings_out)
    attention: Tuple[jnp.ndarray, ...]        # attention maps (save_attn)


class ContraAttnUNet(nn.Module):
    """forward(mri, covars, roi_loc, roi_std, roi_compact) -> ContraOutputs.

    Args mirror the reference forward contract (`:661`): `covars` [B, K]
    carries [abeta, age, sex, edu, cog, meta_tau]; `roi_loc`/`roi_std` are the
    per-sample per-ROI prediction tables ([B, R]) replacing `roi_pred_dicts`;
    `roi_compact` is the compacted ROI id volume ([B, D, H, W], ids 0..R).
    """

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        covariate: Optional[jnp.ndarray] = None,
        roi_loc: Optional[jnp.ndarray] = None,
        roi_std: Optional[jnp.ndarray] = None,
        roi_compact: Optional[jnp.ndarray] = None,
        train: bool = True,
        with_projections: bool = True,
        stage: str = "full",
        encoder_feats: Optional[Tuple[jnp.ndarray, ...]] = None,
    ) -> ContraOutputs:
        """`stage` mirrors `AttentionUNet.__call__`: "encoder" returns the
        backbone's encoder feature tuple; "decoder" consumes it and runs
        gates/decoder/modulator/projection heads. The split train step
        (`train.step.make_split_train_step`) compiles the two stages as
        separate XLA programs; everything else uses "full"."""
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)

        if stage == "encoder":
            return AttentionUNet(cfg, name="unet")(
                x, covariate, train=train, stage="encoder"
            )
        feats: UNetFeatures = AttentionUNet(cfg, name="unet")(
            x, covariate, train=train, stage=stage,
            encoder_feats=encoder_feats,
        )
        out = feats.out

        if cfg.with_modulator:
            out = self._modulator(
                x, out, covariate, roi_loc, roi_std, roi_compact, train, dtype,
                pdtype,
            )
        else:
            out = jax.nn.relu(out.astype(jnp.float32))

        projections: Tuple[jnp.ndarray, ...] = ()
        final_projection = jnp.zeros((x.shape[0], cfg.latent_spaces[-1]),
                                     dtype=jnp.float32)
        if with_projections:
            projections = tuple(
                ProjectionHead(
                    norm=cfg.norm, use_pallas=cfg.pallas_convs, dtype=dtype,
                    param_dtype=pdtype, name=f"proj{i}",
                )(feats.encoder[i], train=train)
                for i in range(cfg.depth)
            )
            # final head: global average pool -> dense -> relu (ref :537-541)
            pooled = jnp.mean(
                out.astype(jnp.float32), axis=(2, 3, 4)
            )  # [B, out_channels]
            final_projection = jax.nn.relu(
                nn.Dense(
                    cfg.latent_spaces[-1], dtype=jnp.float32,
                    param_dtype=pdtype, name="final_proj",
                )(pooled)
            )

        return ContraOutputs(
            out=out.astype(jnp.float32),
            projections=projections,
            final_projection=final_projection,
            encoder=feats.encoder,
            attention=feats.attention,
        )

    def _modulator(
        self, x, out, covariate, roi_loc, roi_std, roi_compact, train, dtype,
        pdtype,
    ) -> jnp.ndarray:
        """`forward_modulator_with_uq` (ref :630-658), vectorized."""
        cfg = self.config
        b = x.shape[0]
        spatial = x.shape[2:5]
        if cfg.remat:
            Stack = nn.remat(StackedFusionConvLayers, static_argnums=(2,))
            FinalConv = nn.remat(Convolution, static_argnums=(2,))
        else:
            Stack, FinalConv = StackedFusionConvLayers, Convolution
        prompt_shape = (1, 1) + tuple(cfg.prompt_shape)
        if tuple(cfg.prompt_shape) != tuple(spatial):
            raise ValueError(
                f"modulator prompts are {cfg.prompt_shape} but input spatial "
                f"dims are {spatial}; set ModelConfig.prompt_shape accordingly"
            )
        pos_prompt = self.param(
            "pos_dynamic_prompt", nn.initializers.normal(1.0), prompt_shape, pdtype
        )
        neg_prompt = self.param(
            "neg_dynamic_prompt", nn.initializers.normal(1.0), prompt_shape, pdtype
        )
        gen_prompt = self.param(
            "general_dynamic_prompt", nn.initializers.normal(1.0), prompt_shape,
            pdtype,
        )

        if covariate is not None:
            abeta = covariate.reshape(b, -1)[:, 0]
        else:
            abeta = jnp.zeros((b,), dtype=jnp.float32)
        is_pos = (abeta == 1.0).reshape(b, 1, 1, 1, 1)
        prompt = jnp.where(is_pos, pos_prompt, neg_prompt).astype(dtype)

        if roi_loc is None or roi_compact is None:
            suvr = jnp.zeros_like(out)
            saliency = jnp.zeros_like(out)
        else:
            loc = jnp.nan_to_num(roi_loc.astype(jnp.float32))
            std = jnp.nan_to_num(
                roi_std.astype(jnp.float32)
            ) if roi_std is not None else jnp.zeros_like(loc)
            suvr = paint_roi_values(roi_compact, loc)[:, None]
            saliency = paint_roi_values(roi_compact, std)[:, None]
            # zero outside the brain (ref :646-647)
            mask = x >= 1e-4
            suvr = jnp.where(mask, suvr, 0.0)
            saliency = jnp.where(mask, saliency, 0.0)

        mod_in = jnp.concatenate(
            [prompt * jnp.ones_like(out), saliency.astype(dtype),
             suvr.astype(dtype)], axis=1,
        )
        modulated = gen_prompt.astype(dtype) + Stack(
            bottleneck_channels=16, out_channels=1, num_convs=3,
            norm=cfg.norm, remat=cfg.remat, use_pallas=cfg.pallas_convs,
            dtype=dtype, param_dtype=pdtype,
            name="deep_modulator_3c",
        )(mod_in, train)

        fused = Stack(
            bottleneck_channels=8, out_channels=1, num_convs=3, norm=cfg.norm,
            remat=cfg.remat, use_pallas=cfg.pallas_convs,
            dtype=dtype, param_dtype=pdtype,
            name="fusion_layer",
        )(jnp.concatenate([modulated, out.astype(dtype)], axis=1), train)

        final = FinalConv(
            out_channels=1, kernel_size=1, act="prelu", norm=cfg.norm,
            use_pallas=cfg.pallas_convs,
            dtype=dtype, param_dtype=pdtype, name="final_pred_head",
        )(jnp.concatenate([out.astype(dtype), fused], axis=1), train)

        return jax.nn.relu(final.astype(jnp.float32))
