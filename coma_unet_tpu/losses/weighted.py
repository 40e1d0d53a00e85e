"""Column-weighted vector regression losses (`criterions.py:214-296`) for the
ROI-SUVR-vector side experiments."""

from __future__ import annotations

import jax.numpy as jnp


def weighted_mse(pred: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """`WeightedMSE` (`criterions.py:263-275`)."""
    return jnp.mean(jnp.square(pred - target) * weights[None, :])


def weighted_l1(pred: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """`WeightedLoss` (`criterions.py:277-296`): mean over columns of
    w_c * sum_n |pred - target|."""
    per_col = jnp.sum(jnp.abs(pred - target), axis=0)
    return jnp.sum(weights * per_col) / weights.shape[0]


def _pearson(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    vx = x - jnp.mean(x)
    vy = y - jnp.mean(y)
    return jnp.sum(vx * vy) / (
        jnp.maximum(jnp.linalg.norm(vx), 1e-12) * jnp.maximum(jnp.linalg.norm(vy), 1e-12)
    )


def weighted_cc(pred: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """`WeightedCC` (`criterions.py:243-261`). The reference overwrites the
    accumulator each column (a bug: `total_loss =` instead of `+=`) so only the
    last column counts; we sum over columns (documented deviation)."""
    total = jnp.asarray(0.0)
    for c in range(pred.shape[1]):
        total = total + weights[c] * (1.0 - _pearson(pred[:, c], target[:, c]))
    return total


def weighted_cccl(pred: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """`WeightedCCCL` (`criterions.py:214-241`): concordance correlation
    coefficient loss, NaN columns contribute w_c * 1."""
    total = jnp.asarray(0.0)
    for c in range(pred.shape[1]):
        x, y = pred[:, c], target[:, c]
        r = _pearson(x, y)
        ccc = (2.0 * r * jnp.std(x) * jnp.std(y)) / (
            jnp.var(x) + jnp.var(y) + jnp.square(jnp.mean(x) - jnp.mean(y))
        )
        ccc = jnp.nan_to_num(ccc, nan=0.0)
        total = total + weights[c] * (1.0 - ccc)
    return total
