"""SSIM3D vs a literal NumPy implementation of the uniform-window SSIM the
reference's MONAI metric computes (win 7, k1=0.01, k2=0.03, valid windows)."""

import numpy as np
import pytest

import jax.numpy as jnp

from coma_unet_tpu.ops.ssim import ssim3d


def _naive_ssim(pred, gt, win=7, k1=0.01, k2=0.03, dr=1.0):
    c1, c2 = (k1 * dr) ** 2, (k2 * dr) ** 2
    d, h, w = pred.shape
    vals = []
    for z in range(d - win + 1):
        for y in range(h - win + 1):
            for x in range(w - win + 1):
                p = pred[z : z + win, y : y + win, x : x + win]
                g = gt[z : z + win, y : y + win, x : x + win]
                mp, mg = p.mean(), g.mean()
                vp = (p * p).mean() - mp * mp
                vg = (g * g).mean() - mg * mg
                cov = (p * g).mean() - mp * mg
                vals.append(
                    ((2 * mp * mg + c1) * (2 * cov + c2))
                    / ((mp**2 + mg**2 + c1) * (vp + vg + c2))
                )
    return float(np.mean(vals))


def test_ssim_matches_naive():
    rng = np.random.default_rng(0)
    pred = rng.uniform(size=(9, 9, 9)).astype(np.float32)
    gt = np.clip(pred + rng.normal(0, 0.05, size=(9, 9, 9)), 0, 1).astype(
        np.float32
    )
    got = float(ssim3d(jnp.asarray(pred[None]), jnp.asarray(gt[None])))
    want = _naive_ssim(pred.astype(np.float64), gt.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(1)
    v = rng.uniform(size=(1, 10, 10, 10)).astype(np.float32)
    assert float(ssim3d(jnp.asarray(v), jnp.asarray(v))) == pytest.approx(
        1.0, abs=1e-5
    )


def test_ssim_degrades_with_noise():
    rng = np.random.default_rng(2)
    v = rng.uniform(size=(1, 12, 12, 12)).astype(np.float32)
    noisy1 = v + rng.normal(0, 0.02, v.shape).astype(np.float32)
    noisy2 = v + rng.normal(0, 0.2, v.shape).astype(np.float32)
    s1 = float(ssim3d(jnp.asarray(v), jnp.asarray(noisy1)))
    s2 = float(ssim3d(jnp.asarray(v), jnp.asarray(noisy2)))
    assert s1 > s2


def test_ssim_gaussian_variant_runs():
    rng = np.random.default_rng(3)
    v = rng.uniform(size=(1, 16, 16, 16)).astype(np.float32)
    s = float(ssim3d(jnp.asarray(v), jnp.asarray(v), kernel="gaussian",
                     win_size=11, kernel_sigma=1.5))
    assert s == pytest.approx(1.0, abs=1e-5)


def test_psnr_parity_with_reference_formula():
    """PSNR (BASELINE.md: parity within +-0.001) vs a numpy oracle."""
    import numpy as np

    from coma_unet_tpu.metrics.voxel import voxel_metrics

    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (2, 1, 8, 8, 8)).astype(np.float32)
    pred = gt + rng.normal(0, 0.05, gt.shape).astype(np.float32)
    vox = voxel_metrics(jnp.asarray(pred), jnp.asarray(gt), with_ssim=False)
    for i in range(2):
        mse = float(np.mean((pred[i] - gt[i]) ** 2))
        want = 10.0 * np.log10(1.0 / mse)
        np.testing.assert_allclose(float(vox["psnr"][i]), want, atol=1e-3)
