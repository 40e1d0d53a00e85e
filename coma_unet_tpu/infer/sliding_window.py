"""Sliding-window full-volume synthesis with overlap blending.

New TPU-native capability (no reference code exists — BASELINE.json config 1
specifies it as the mechanism for full-resolution volumes; the reference fits
memory by 2 mm resampling + 128^3 center-pad instead, `VolumeDataset.py:
121-126`): tile the volume into overlapping patches, run the jitted model
forward per patch tile, blend with a Gaussian importance map, normalize.

The patch grid is static for a given (volume shape, patch size, overlap), so
the whole pipeline is a fixed sequence of compiled calls; patches are batched
to keep the MXU fed.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _grid_starts(size: int, patch: int, stride: int) -> Sequence[int]:
    if size <= patch:
        return [0]
    starts = list(range(0, size - patch + 1, stride))
    if starts[-1] != size - patch:
        starts.append(size - patch)
    return starts


@lru_cache(maxsize=16)
def gaussian_importance_map(
    patch: Tuple[int, int, int], sigma_scale: float = 0.125
) -> np.ndarray:
    """MONAI-style Gaussian blending weights: peak at the patch center,
    sigma = sigma_scale * patch size per axis."""
    maps = []
    for p in patch:
        xs = np.arange(p) - (p - 1) / 2.0
        sigma = max(p * sigma_scale, 1e-3)
        maps.append(np.exp(-0.5 * (xs / sigma) ** 2))
    w = maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
    w = w / w.max()
    return np.maximum(w, 1e-4).astype(np.float32)


def make_infer_fn(model) -> Callable:
    """Jitted single-call forward: (variables, mri, covars, roi_loc, roi_std,
    roi_compact) -> [B, 1, D, H, W]."""

    @jax.jit
    def infer(variables, mri, covars, roi_loc, roi_std, roi_compact):
        outs = model.apply(
            variables, mri, covars, roi_loc, roi_std, roi_compact,
            train=False, with_projections=False,
        )
        return outs.out

    return infer


def sliding_window_inference(
    infer_fn: Callable,
    variables,
    mri: np.ndarray,
    covars: np.ndarray,
    roi_loc: np.ndarray,
    roi_std: np.ndarray,
    roi_compact: np.ndarray,
    patch_size: Tuple[int, int, int] = (128, 128, 128),
    overlap: float = 0.25,
    batch_size: int = 4,
    sigma_scale: float = 0.125,
) -> np.ndarray:
    """Synthesize a full volume larger than the training patch.

    Args:
      infer_fn: jitted forward from `make_infer_fn` (or any callable with the
        same signature).
      mri: [1, 1, D, H, W]; roi_compact: [1, D, H, W]; covars [1, K];
        roi_loc/roi_std [1, R].

    Returns [1, 1, D, H, W] float32.
    """
    assert mri.ndim == 5 and mri.shape[0] == 1
    spatial = mri.shape[2:]
    patch = tuple(min(p, s) for p, s in zip(patch_size, spatial))
    strides = tuple(max(1, int(p * (1.0 - overlap))) for p in patch)
    grids = [
        _grid_starts(s, p, st) for s, p, st in zip(spatial, patch, strides)
    ]
    positions = [
        (z, y, x) for z in grids[0] for y in grids[1] for x in grids[2]
    ]

    weight = gaussian_importance_map(patch, sigma_scale)
    out = np.zeros((1, 1) + tuple(spatial), np.float32)
    norm = np.zeros(tuple(spatial), np.float32)

    mri = np.asarray(mri, np.float32)
    roi_compact = np.asarray(roi_compact)

    for i in range(0, len(positions), batch_size):
        chunk = positions[i : i + batch_size]
        mris, rois = [], []
        for (z, y, x) in chunk:
            sl = (0, slice(None), slice(z, z + patch[0]),
                  slice(y, y + patch[1]), slice(x, x + patch[2]))
            mris.append(mri[sl])
            rois.append(roi_compact[(0, slice(z, z + patch[0]),
                                     slice(y, y + patch[1]),
                                     slice(x, x + patch[2]))])
        b = len(chunk)
        # pad the last chunk so compiled shapes stay static
        while len(mris) < batch_size:
            mris.append(mris[-1])
            rois.append(rois[-1])
        pm = jnp.asarray(np.stack(mris))
        pr = jnp.asarray(np.stack(rois))
        cov = jnp.broadcast_to(jnp.asarray(covars), (batch_size, covars.shape[-1]))
        loc = jnp.broadcast_to(jnp.asarray(roi_loc), (batch_size, roi_loc.shape[-1]))
        std = jnp.broadcast_to(jnp.asarray(roi_std), (batch_size, roi_std.shape[-1]))
        pred = np.asarray(infer_fn(variables, pm, cov, loc, std, pr))
        for j, (z, y, x) in enumerate(chunk):
            out[0, 0, z : z + patch[0], y : y + patch[1], x : x + patch[2]] += (
                pred[j, 0] * weight
            )
            norm[z : z + patch[0], y : y + patch[1], x : x + patch[2]] += weight
    out[0, 0] /= np.maximum(norm, 1e-8)
    return out
