"""Device-side / host-side spatial preprocessing.

`center_pad_crop` replaces the reference's `pad_volume` closure
(`data_util.py:814-828`): center-pad each spatial dim with zeros up to the
target. The reference crops *only* dim -2 on overshoot (a bug); here any
overshooting dim is center-cropped symmetrically.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import numpy as np

Array = np.ndarray


def _pad_crop_amounts(n: int, target: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Returns ((pad_lo, pad_hi), (crop_lo, crop_hi))."""
    if n < target:
        lo = (target - n) // 2
        hi = target - n - lo
        return (lo, hi), (0, n)
    lo = (n - target) // 2
    return (0, 0), (lo, lo + target)


def center_pad_crop(
    vol: Array,
    target: Union[int, Sequence[int]] = (128, 128, 128),
    fill_value: float = 0.0,
) -> Array:
    """Center pad (and crop, if larger) the trailing 3 dims to `target`.

    Works on [..., D, H, W] arrays (NumPy). Use inside jit via fixed shapes —
    shapes are static so the same code traces fine on jnp arrays.
    """
    if isinstance(target, int):
        target = (target,) * 3
    spatial = vol.shape[-3:]
    pads, crops = zip(*[_pad_crop_amounts(n, t) for n, t in zip(spatial, target)])
    # crop first
    sl = (Ellipsis,) + tuple(slice(lo, hi) for lo, hi in crops)
    vol = vol[sl]
    pad_width = [(0, 0)] * (vol.ndim - 3) + list(pads)
    if any(lo or hi for lo, hi in pads):
        vol = np.pad(vol, pad_width, mode="constant", constant_values=fill_value) \
            if isinstance(vol, np.ndarray) else _jnp_pad(vol, pad_width, fill_value)
    return vol


def _jnp_pad(vol, pad_width, fill_value):
    import jax.numpy as jnp

    return jnp.pad(vol, pad_width, mode="constant", constant_values=fill_value)
