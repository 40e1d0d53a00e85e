"""3D SSIM matching the reference's MONAI `SSIMMetric(spatial_dims=3,
data_range=1.0)` usage (`attn_unet_data_parallel.py:1176-1178,1234-1239`):
uniform window of size 7, k1=0.01, k2=0.03, valid (no-pad) windows, mean over
the SSIM map, then mean over samples. A Gaussian-window variant is provided
for newer-MONAI semantics. Layout: NCDHW ([B, C, D, H, W])."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_DIMNUMS = ("NCDHW", "OIDHW", "NCDHW")


def _sep_filter(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable per-channel filter over the trailing 3 spatial dims of a
    [B, C, D, H, W] array (VALID)."""
    c = x.shape[1]
    size = kernel.shape[0]
    for axis in range(3):
        shape = [1, 1, 1]
        shape[axis] = size
        k = jnp.broadcast_to(
            kernel.reshape(tuple(shape)), (c, 1) + tuple(shape)
        ).astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "VALID",
            dimension_numbers=_DIMNUMS,
            feature_group_count=c,
        )
    return x


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    half = (size - 1) / 2.0
    xs = np.arange(size) - half
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("win_size", "kernel", "reduce", "kernel_sigma"))
def ssim3d(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
    kernel: str = "uniform",
    kernel_sigma: float = 1.5,
    reduce: str = "mean",
) -> jnp.ndarray:
    """Structural similarity over 3D volumes.

    Args:
      pred, target: [B, C, D, H, W] (or [B, D, H, W] — channel dim added).
      reduce: 'mean' -> scalar; 'none' -> per-sample [B].
    """
    if pred.ndim == 4:
        pred = pred[:, None]
        target = target[:, None]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    if kernel == "uniform":
        k = jnp.full((win_size,), 1.0 / win_size, dtype=jnp.float32)
    else:
        k = jnp.asarray(_gaussian_kernel1d(win_size, kernel_sigma))
    filt = lambda v: _sep_filter(v, k)  # noqa: E731

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = filt(pred)
    mu_y = filt(target)
    mu_xx = filt(pred * pred)
    mu_yy = filt(target * target)
    mu_xy = filt(pred * target)

    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov_xy = mu_xy - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + c1) * (2.0 * cov_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    ssim_map = num / den

    per_sample = jnp.mean(ssim_map, axis=(1, 2, 3, 4))
    if reduce == "mean":
        return jnp.mean(per_sample)
    return per_sample
