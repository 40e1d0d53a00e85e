"""Composite training loss — `GenerativeContrastiveLoss`
(`criterions.py:485-576`):

    L = gen_weight * L_gen + lambda_2 * L_predspace + lambda_1 * L_tCDS

Live assembly (`validation.py:135-155`): L_gen = RoiMSE(225*ones, 36 ROIs),
lambda_2 = 0 (pred-space slot dead), lambda_1 = 1 with RnC in the tCDS slot
(`-rnc`). Returns (total, gen, weighted predspace, weighted tCDS) exactly like
the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.struct
import jax.numpy as jnp

from coma_unet_tpu.config import LossConfig
from coma_unet_tpu.losses.contrastive import rnc_loss, triplet_loss, truncated_cds
from coma_unet_tpu.losses.roi_losses import roi_mse


@flax.struct.dataclass
class LossOutputs:
    total: jnp.ndarray
    gen: jnp.ndarray              # per-sample [B] (batch_reduction=None, ref :717)
    pred_space: jnp.ndarray       # weighted (lambda_2 applied)
    tcds: jnp.ndarray             # weighted (lambda_1 applied)


@dataclass(frozen=True)
class GenerativeContrastiveLoss:
    """Functional composite criterion. Static config, pure __call__."""

    config: LossConfig = field(default_factory=LossConfig)

    def __call__(
        self,
        pred: jnp.ndarray,
        target: jnp.ndarray,
        roi_compact: jnp.ndarray,
        roi_weights: jnp.ndarray,
        *,
        # RnC slot (rnc=True): features + labels
        rnc_features: Optional[jnp.ndarray] = None,
        rnc_labels: Optional[jnp.ndarray] = None,
        # tCDS slot (rnc=False): per-level (anchor, pos, neg) projections
        anchor_projs: Optional[Sequence[jnp.ndarray]] = None,
        pos_projs: Optional[Sequence[jnp.ndarray]] = None,
        neg_projs: Optional[Sequence[jnp.ndarray]] = None,
        # pred-space slot: final (anchor, pos, neg) embeddings
        final_reprs: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
        voxel_weights: Optional[jnp.ndarray] = None,
        valid: Optional[jnp.ndarray] = None,
    ) -> LossOutputs:
        """`valid` ([B] 0/1) excludes the loader's wrap-padded duplicate rows
        from every term, so the loss (and its gradient) equals the reference's
        true-partial-batch objective (`attn_unet_data_parallel.py:779`)."""
        cfg = self.config
        gen = roi_mse(
            pred, target, roi_compact, roi_weights,
            voxel_weights=voxel_weights, reduction=None,
        )  # per-sample [B], summed below (`criterions.py:560`)
        vsum = gen if valid is None else gen * valid.reshape(-1).astype(gen.dtype)
        total = cfg.gen_weight * jnp.sum(vsum)

        if cfg.reg_weight != 0.0 and final_reprs is not None:
            a, p, n = final_reprs
            pred_space = cfg.reg_weight * triplet_loss(
                a, p, n, margin=cfg.triplet_margin, valid=valid
            )
        else:
            pred_space = jnp.asarray(0.0, dtype=jnp.float32)

        if cfg.rnc:
            if rnc_features is None or rnc_labels is None:
                raise ValueError("rnc=True requires rnc_features and rnc_labels")
            tcds = cfg.ds_reg_weight * rnc_loss(
                rnc_features, rnc_labels, temperature=cfg.rnc_temperature,
                valid=valid,
            )
        else:
            if anchor_projs is None:
                raise ValueError("rnc=False requires per-level projections")
            tcds = cfg.ds_reg_weight * truncated_cds(
                anchor_projs, pos_projs, neg_projs, cfg.cds_weights,
                margin=cfg.triplet_margin, valid=valid,
            )

        total = total + pred_space + tcds
        return LossOutputs(total=total, gen=gen, pred_space=pred_space, tcds=tcds)
