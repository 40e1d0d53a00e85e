"""Spacing-based volume resampling.

Replicates the reference's SimpleITK resample-to-2mm semantics
(`VolumeDataset.py:240-264`, duplicated in four other files): output size is
``round(size * spacing / new_spacing)`` per axis, identity transform, same
origin/direction, nearest-neighbor interpolation. ITK's NN interpolator maps
output index ``i`` to continuous input index ``i * new_spacing / spacing`` and
rounds half-up; out-of-range samples take a fill value.

Note: the reference sets the ITK default (out-of-range) pixel value to
``volume.GetPixelIDValue()`` — the *pixel type enum*, e.g. 8.0 for float32 —
an apparent bug we do not replicate; ``fill_value`` defaults to 0.

Both a NumPy host path (used by the data pipeline) and a jittable device path
are provided; they are index-identical.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def output_size(
    size: Sequence[int], spacing: Sequence[float], new_spacing: Sequence[float]
) -> Tuple[int, ...]:
    """``int(round(n * s / s'))`` per axis — matches `VolumeDataset.py:245-249`
    (numpy round: banker's rounding, as np.round is what the reference uses)."""
    return tuple(
        int(np.round(n * (s / ns))) for n, s, ns in zip(size, spacing, new_spacing)
    )


def _nn_indices(out_n: int, in_n: int, ratio: float) -> np.ndarray:
    """ITK NN: in_idx = round_half_up(out_idx * ratio), clipped with fill
    handled by caller. ratio = new_spacing / spacing."""
    idx = np.floor(np.arange(out_n) * ratio + 0.5).astype(np.int64)
    return idx


def resize_nearest(
    vol: np.ndarray,
    spacing: Sequence[float],
    new_spacing: Sequence[float] = (2.0, 2.0, 2.0),
    fill_value: float = 0.0,
) -> np.ndarray:
    """Nearest-neighbor resample (host/NumPy).

    Args:
      vol: [D, H, W] array, axes in the same order as `spacing`.
      spacing: per-axis voxel spacing of `vol` (same axis order as vol).
      new_spacing: target spacing.
    """
    out_shape = output_size(vol.shape, spacing, new_spacing)
    gathered = vol
    for axis in range(3):
        ratio = new_spacing[axis] / spacing[axis]
        idx = _nn_indices(out_shape[axis], vol.shape[axis], ratio)
        in_range = (idx >= 0) & (idx < vol.shape[axis])
        idx_c = np.clip(idx, 0, vol.shape[axis] - 1)
        gathered = np.take(gathered, idx_c, axis=axis)
        if not in_range.all():
            sl = [slice(None)] * 3
            sl[axis] = ~in_range
            gathered[tuple(sl)] = fill_value
    return gathered


def resize_linear(
    vol: np.ndarray,
    spacing: Sequence[float],
    new_spacing: Sequence[float] = (2.0, 2.0, 2.0),
) -> np.ndarray:
    """Trilinear resample (host/NumPy), separable per axis."""
    out = vol.astype(np.float32)
    for axis in range(3):
        ratio = new_spacing[axis] / spacing[axis]
        n_out = int(np.round(vol.shape[axis] * (spacing[axis] / new_spacing[axis])))
        pos = np.arange(n_out) * ratio
        lo = np.floor(pos).astype(np.int64)
        frac = (pos - lo).astype(np.float32)
        lo = np.clip(lo, 0, out.shape[axis] - 1)
        hi = np.clip(lo + 1, 0, out.shape[axis] - 1)
        a = np.take(out, lo, axis=axis)
        b = np.take(out, hi, axis=axis)
        shape = [1, 1, 1]
        shape[axis] = n_out
        w = frac.reshape(shape)
        out = a * (1.0 - w) + b * w
    return out


@partial(jax.jit, static_argnames=("out_shape",))
def resize_nearest_device(
    vol: jnp.ndarray,
    ratios: jnp.ndarray,
    out_shape: Tuple[int, int, int],
) -> jnp.ndarray:
    """Jittable NN resample for fixed output shape (device-side preprocessing
    per BASELINE.json's north star). `ratios` = new_spacing / spacing, [3]."""
    out = vol
    for axis in range(3):
        pos = jnp.arange(out_shape[axis], dtype=jnp.float32) * ratios[axis]
        idx = jnp.clip(
            jnp.floor(pos + 0.5).astype(jnp.int32), 0, vol.shape[axis] - 1
        )
        out = jnp.take(out, idx, axis=axis)
    return out
