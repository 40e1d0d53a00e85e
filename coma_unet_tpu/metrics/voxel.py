"""Per-sample voxel-level evaluation metrics
(`attn_unet_data_parallel.py:1214-1231`): MAE, MAPE (NaN-masked %), RSE,
RRMSE, SSIM — computed as per-sample values inside one jitted function.

Aggregation notes vs the reference:
  * The reference accumulates per-*batch* means but divides by the number of
    *samples* (`:1215,1302`), deflating MAE/RSE/RRMSE by the batch size when
    batch > 1, and only counts MAPE's valid-voxel denominator inside the
    pos/neg branches (`:1268,1283` vs `:1303`), breaking the global MAPE when
    abeta == -1. We return true per-sample values; the host accumulator then
    averages per sample — correct for any batch size (documented deviation).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from coma_unet_tpu.ops.ssim import ssim3d


@partial(jax.jit, static_argnames=("with_ssim",))
def voxel_metrics(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    with_ssim: bool = True,
    data_range: float = 1.0,
    eps: float = 1e-8,
) -> Dict[str, jnp.ndarray]:
    """pred, gt: [B, C, D, H, W] (or [B, D, H, W]). Returns per-sample arrays.

    Keys: mae [B], mape_num [B] (sum of 100*|rel err| over valid voxels),
    mape_cnt [B] (valid voxel count), rse [B], rrmse [B], ssim [B],
    abs_err_vol [B, spatial...] (for voxel-wise error grids).
    """
    if pred.ndim == 4:
        pred = pred[:, None]
        gt = gt[:, None]
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    b = pred.shape[0]
    diff = pred - gt
    flat_diff = diff.reshape(b, -1)
    flat_gt = gt.reshape(b, -1)

    mae = jnp.mean(jnp.abs(flat_diff), axis=-1)

    valid = jnp.abs(flat_gt) > eps
    rel = jnp.where(valid, jnp.abs(flat_diff / jnp.where(valid, flat_gt, 1.0)), 0.0)
    mape_num = jnp.sum(rel * 100.0, axis=-1)
    mape_cnt = jnp.sum(valid.astype(jnp.float32), axis=-1)

    gt_mean = jnp.mean(flat_gt, axis=-1, keepdims=True)
    rse = jnp.sum(jnp.square(flat_diff), axis=-1) / jnp.sum(
        jnp.square(flat_gt - gt_mean), axis=-1
    )
    rrmse = jnp.sqrt(
        jnp.sum(jnp.square(flat_diff), axis=-1)
        / jnp.sum(jnp.square(flat_gt), axis=-1)
    )

    # PSNR (BASELINE.md quality-parity target: SSIM/PSNR within +-0.001):
    # 10*log10(range^2 / MSE), per sample, eps-floored against exact matches
    mse = jnp.mean(jnp.square(flat_diff), axis=-1)
    psnr = 10.0 * jnp.log10(
        jnp.square(data_range) / jnp.maximum(mse, 1e-12)
    )

    out = {
        "mae": mae,
        "mape_num": mape_num,
        "mape_cnt": mape_cnt,
        "rse": rse,
        "rrmse": rrmse,
        "psnr": psnr,
        "abs_rel_vol": rel.reshape(gt.shape) ,
    }
    if with_ssim:
        out["ssim"] = ssim3d(pred, gt, data_range=data_range, reduce="none")
    return out
