"""ROI-weighted generative losses (`criterions.py:28-211`), reformulated as
fused segment/gather ops — no per-ROI Python loops.

All functions take a *compact* ROI id volume (see `ops.roi.compact_roi`) of
shape [B, D, H, W] with ids in [0, R] (0 = background) and a per-ROI weight
vector [R].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from coma_unet_tpu.ops.roi import roi_weight_mask


def _spatial(x: jnp.ndarray) -> jnp.ndarray:
    """Collapse to [B, voxels], dropping a trailing channel dim if present."""
    return x.reshape(x.shape[0], -1)


def roi_mse(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    roi_compact: jnp.ndarray,
    roi_weights: jnp.ndarray,
    voxel_weights: Optional[jnp.ndarray] = None,
    reduction: Optional[str] = "mean",
) -> jnp.ndarray:
    """`RoiMSE.forward` (`criterions.py:181-211`).

    Reference semantics (live config, voxel_wise=False): a weight mask that is
    0 at background and w_i inside ROI i; the per-sample loss is
    mean(mask_b) * mean_voxels((pred_b - gt_b)^2) — the inner voxel MSE is a
    per-sample scalar, so the mask contributes only through its mean.
    With `voxel_weights` (voxel_wise=True) the mask is the normalized template
    weight grid instead.

    Returns scalar if reduction == 'mean', else per-sample [B].
    """
    se = jnp.mean(jnp.square(_spatial(pred) - _spatial(gt)), axis=-1)  # [B]
    if voxel_weights is not None:
        mask_mean = jnp.mean(voxel_weights)
        per_sample = se * mask_mean
    else:
        mask = roi_weight_mask(roi_compact, roi_weights, background=0.0)
        per_sample = se * jnp.mean(_spatial(mask), axis=-1)
    if reduction == "mean":
        return jnp.mean(per_sample)
    return per_sample


def roi_rse(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    roi_compact: jnp.ndarray,
    roi_weights: jnp.ndarray,
    reduction: str = "mean",
) -> jnp.ndarray:
    """`RoiRSE.forward` (`criterions.py:101-121`): weighted relative squared
    error. mask is ones with w_i inside ROI i; numerator sums mask*(gt-pred)^2;
    denominator sums (gt - weighted_mean(gt))^2 (unweighted, per reference)."""
    mask = _spatial(roi_weight_mask(roi_compact, roi_weights, background=1.0))
    p, g = _spatial(pred), _spatial(gt)
    gt_mean = jnp.mean(mask * g, axis=-1, keepdims=True)
    num = jnp.sum(mask * jnp.square(g - p), axis=-1)
    den = jnp.sum(jnp.square(g - gt_mean), axis=-1)
    wrse = num / den
    return jnp.mean(wrse) if reduction == "mean" else jnp.sum(wrse)


def roi_rrmse(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    roi_compact: jnp.ndarray,
    roi_weights: jnp.ndarray,
    reduction: str = "mean",
) -> jnp.ndarray:
    """`RoiRRMSE.forward` (`criterions.py:40-67`): sqrt(sum mask*(gt-pred)^2 /
    sum mask*gt^2), mask ones with w_i in ROI i."""
    mask = _spatial(roi_weight_mask(roi_compact, roi_weights, background=1.0))
    p, g = _spatial(pred), _spatial(gt)
    num = jnp.sum(mask * jnp.square(g - p), axis=-1)
    den = jnp.sum(mask * jnp.square(g), axis=-1)
    wrrmse = jnp.sqrt(num / den)
    return jnp.mean(wrrmse) if reduction == "mean" else jnp.sum(wrrmse)


def make_voxel_weights(
    template_compact: jnp.ndarray, roi_weights: jnp.ndarray
) -> jnp.ndarray:
    """Voxel-wise weight grid from the template ROI mask
    (`criterions.py:135-144`): ones background, w_i in ROI i, L2-normalized,
    rescaled so the mean is 5."""
    w = roi_weight_mask(template_compact, roi_weights, background=1.0)
    w = w / jnp.linalg.norm(w.reshape(-1))
    return (5.0 / jnp.mean(w)) * w


def update_roi_weights(
    roi_weights: jnp.ndarray, errors: jnp.ndarray, scale_factor: float = 360.0
) -> jnp.ndarray:
    """`RoiMSE.calculate_new_weights` (`criterions.py:154-159`): error-driven
    adaptive reweighting. `errors` = per-ROI validation MAPE fractions."""
    new = roi_weights * 0.5 * errors
    return scale_factor * new / jnp.linalg.norm(new)


def update_voxel_weights(
    voxel_weights: jnp.ndarray, errors: jnp.ndarray
) -> jnp.ndarray:
    """`RoiMSE.calculate_new_voxel_weights` (`criterions.py:161-168`)."""
    new = voxel_weights * (1.0 + errors)
    new = new / jnp.linalg.norm(new.reshape(-1))
    return new * (jnp.mean(voxel_weights) / jnp.mean(new))
