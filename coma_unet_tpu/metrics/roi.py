"""Per-sample, per-ROI evaluation metrics — the fused replacement for
`calc_roi_metrics` (`attn_unet_data_parallel.py:1361-1397`) and
`RoiCorrMetric.acc_roi_corr` (`:49-60`): every quantity the reference builds
with a 36-iteration mask loop falls out of four `roi_sums` calls.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from coma_unet_tpu.ops.roi import roi_sums


@partial(jax.jit, static_argnames=("num_rois",))
def roi_metrics(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    roi_compact: jnp.ndarray,
    num_rois: int,
    eps: float = 1e-8,
) -> Dict[str, jnp.ndarray]:
    """All arrays [B, R]. pred/gt: [B, C, D, H, W] or [B, D, H, W];
    roi_compact: [B, D, H, W] ids in [0, R].

    Keys:
      mae      — per-ROI mean |err|                  (ref :1378-1379)
      mape_num — sum of |rel err| in ROI (valid)     (ref :1381-1382)
      mape_cnt — valid (non-NaN) voxel count in ROI  (ref :1383)
      wrrmse   — sqrt(sum err^2 / sum gt^2) in ROI   (ref :1386-1389)
      rse      — sum err^2 / sum (gt - roi_mean)^2   (ref :1391-1395)
      pred_mean, gt_mean — ROI means (corr inputs)   (ref :49-60)
      count    — ROI voxel counts
    """
    if pred.ndim == 5:
        pred = pred[:, 0]
        gt = gt[:, 0]
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    diff = pred - gt

    count = roi_sums(jnp.ones_like(gt), roi_compact, num_rois)
    safe_count = jnp.maximum(count, 1.0)

    abs_sum = roi_sums(jnp.abs(diff), roi_compact, num_rois)
    mae = abs_sum / safe_count

    valid = jnp.abs(gt) > eps
    rel = jnp.where(valid, jnp.abs(diff / jnp.where(valid, gt, 1.0)), 0.0)
    mape_num = roi_sums(rel, roi_compact, num_rois)
    mape_cnt = roi_sums(valid.astype(jnp.float32), roi_compact, num_rois)

    sq_sum = roi_sums(jnp.square(diff), roi_compact, num_rois)
    gt_sq_sum = roi_sums(jnp.square(gt), roi_compact, num_rois)
    wrrmse = jnp.sqrt(sq_sum / jnp.maximum(gt_sq_sum, eps))

    gt_sum = roi_sums(gt, roi_compact, num_rois)
    gt_mean = gt_sum / safe_count
    # sum (gt - mean)^2 over ROI = sum gt^2 - count * mean^2
    den = gt_sq_sum - count * jnp.square(gt_mean)
    rse = sq_sum / jnp.maximum(den, eps)

    pred_mean = roi_sums(pred, roi_compact, num_rois) / safe_count

    return {
        "mae": mae,
        "mape_num": mape_num,
        "mape_cnt": mape_cnt,
        "wrrmse": wrrmse,
        "rse": rse,
        "pred_mean": pred_mean,
        "gt_mean": gt_mean,
        "count": count,
    }
