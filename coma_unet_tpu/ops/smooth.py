"""Gaussian smoothing matching MONAI `GaussianSmooth` semantics
(`VolumeDataset.py:138-140`, default sigma=1.0; `data_util.py:98-123` uses an
FWHM-2 kernel, sigma = 2 / 2.355).

MONAI's default builds the 1D kernel with the "erf" approximation: the kernel
tap at integer x integrates the Gaussian over [x-0.5, x+0.5] via
0.5*(erf((x+0.5)/(sigma*sqrt(2))) - erf((x-0.5)/(sigma*sqrt(2)))), truncated
at 4 sigma, normalized. Convolution is separable, SAME (zero) padding.
"""

from __future__ import annotations

from functools import partial
import math

import jax
import jax.numpy as jnp
import numpy as np

FWHM_TO_SIGMA = 1.0 / (2.0 * math.sqrt(2.0 * math.log(2.0)))  # 1/2.3548


def gaussian_kernel1d(sigma: float, truncated: float = 4.0, approx: str = "erf") -> np.ndarray:
    tail = max(int(sigma * truncated + 0.5), 1)
    xs = np.arange(-tail, tail + 1, dtype=np.float64)
    if approx == "erf":
        from scipy.special import erf  # scipy ships with the baked deps

        s = sigma * math.sqrt(2.0)
        k = 0.5 * (erf((xs + 0.5) / s) - erf((xs - 0.5) / s))
    else:  # "sampled"
        k = np.exp(-0.5 * (xs / sigma) ** 2)
    k = k / k.sum()
    return k.astype(np.float32)


@partial(jax.jit, static_argnames=("sigma", "truncated", "approx"))
def gaussian_smooth(
    x: jnp.ndarray,
    sigma: float = 1.0,
    truncated: float = 4.0,
    approx: str = "erf",
) -> jnp.ndarray:
    """Separable 3D Gaussian smoothing with SAME padding.

    Args:
      x: [B, C, D, H, W] or [D, H, W].
    """
    squeeze = False
    if x.ndim == 3:
        x = x[None, None]
        squeeze = True
    kernel = jnp.asarray(gaussian_kernel1d(sigma, truncated, approx), dtype=x.dtype)
    size = kernel.shape[0]
    pad = size // 2
    c = x.shape[1]
    for axis in range(3):
        shape = [1, 1, 1]
        shape[axis] = size
        padding = [(0, 0)] * 3
        padding[axis] = (pad, pad)
        k = jnp.broadcast_to(kernel.reshape(tuple(shape)), (c, 1) + tuple(shape))
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), padding,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            feature_group_count=c,
        )
    if squeeze:
        x = x[0, 0]
    return x
