"""Golden-value loss tests vs straight NumPy implementations of the reference
formulas (`criterions.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.config import LossConfig
from coma_unet_tpu.losses import (
    GenerativeContrastiveLoss,
    cluster_npair_loss,
    heteroscedastic_loss,
    rnc_loss,
    roi_mse,
    roi_rrmse,
    roi_rse,
    triplet_loss,
    truncated_cds,
    weighted_l1,
    weighted_mse,
)
from coma_unet_tpu.ops.roi import compact_roi, make_roi_lut


def _vol_fixture(seed=0, b=2, s=8, r=4):
    rng = np.random.default_rng(seed)
    pred = rng.uniform(size=(b, s, s, s)).astype(np.float32)
    gt = rng.uniform(size=(b, s, s, s)).astype(np.float32)
    roi_indices = list(range(1, r + 1))
    roi = rng.integers(0, r + 1, size=(b, s, s, s))
    weights = rng.uniform(1.0, 5.0, size=r).astype(np.float32)
    lut = make_roi_lut(roi_indices)
    compact = compact_roi(jnp.asarray(roi), lut)
    return pred, gt, roi, weights, compact, roi_indices


def test_roi_mse_matches_reference_formula():
    pred, gt, roi, weights, compact, roi_indices = _vol_fixture()
    got = np.asarray(
        roi_mse(jnp.asarray(pred), jnp.asarray(gt), compact, jnp.asarray(weights),
                reduction=None)
    )
    # reference (`criterions.py:181-211`, voxel_wise=False): mask zeros with
    # w_i in ROI i; loss_b = mean(mask_b) * mean_voxels((pred-gt)^2)
    for b in range(pred.shape[0]):
        mask = np.zeros_like(pred[b])
        for i, idx in enumerate(roi_indices):
            mask[roi[b] == idx] = weights[i]
        want = mask.mean() * np.mean((pred[b] - gt[b]) ** 2)
        np.testing.assert_allclose(got[b], want, rtol=1e-5)


def test_roi_rse_matches_reference_formula():
    pred, gt, roi, weights, compact, roi_indices = _vol_fixture()
    got = float(
        roi_rse(jnp.asarray(pred), jnp.asarray(gt), compact, jnp.asarray(weights))
    )
    per_sample = []
    for b in range(pred.shape[0]):
        mask = np.ones_like(pred[b])
        for i, idx in enumerate(roi_indices):
            mask[roi[b] == idx] = weights[i]
        gt_mean = (mask * gt[b]).mean()
        num = (mask * (gt[b] - pred[b]) ** 2).sum()
        den = ((gt[b] - gt_mean) ** 2).sum()
        per_sample.append(num / den)
    np.testing.assert_allclose(got, np.mean(per_sample), rtol=1e-5)


def test_roi_rrmse_matches_reference_formula():
    pred, gt, roi, weights, compact, roi_indices = _vol_fixture()
    got = float(
        roi_rrmse(jnp.asarray(pred), jnp.asarray(gt), compact, jnp.asarray(weights))
    )
    per_sample = []
    for b in range(pred.shape[0]):
        mask = np.ones_like(pred[b])
        for i, idx in enumerate(roi_indices):
            mask[roi[b] == idx] = weights[i]
        num = (mask * (gt[b] - pred[b]) ** 2).sum()
        den = (mask * gt[b] ** 2).sum()
        per_sample.append(np.sqrt(num / den))
    np.testing.assert_allclose(got, np.mean(per_sample), rtol=1e-5)


def _rnc_reference(features, labels, t=2.0):
    """Literal port of the RnC formula (`criterions.py:614-644`) in NumPy."""
    n = features.shape[0]
    label_diffs = np.abs(labels[:, None, :] - labels[None, :, :]).sum(-1)
    logits = -np.linalg.norm(
        features[:, None, :] - features[None, :, :], axis=-1
    ) / t
    logits = logits - logits.max(axis=1, keepdims=True)
    exp_logits = np.exp(logits)
    off = ~np.eye(n, dtype=bool)
    logits = logits[off].reshape(n, n - 1)
    exp_logits = exp_logits[off].reshape(n, n - 1)
    label_diffs = label_diffs[off].reshape(n, n - 1)
    loss = 0.0
    for k in range(n - 1):
        pos_logits = logits[:, k]
        pos_ld = label_diffs[:, k]
        neg_mask = (label_diffs >= pos_ld[:, None]).astype(np.float64)
        pos_log_probs = pos_logits - np.log((neg_mask * exp_logits).sum(-1))
        loss += -(pos_log_probs / (n * (n - 1))).sum()
    return loss


def test_rnc_matches_reference_loop():
    rng = np.random.default_rng(1)
    f = rng.normal(size=(6, 16)).astype(np.float32)
    l = rng.uniform(size=(6, 6)).astype(np.float32)
    got = float(rnc_loss(jnp.asarray(f), jnp.asarray(l), temperature=2.0))
    want = _rnc_reference(f.astype(np.float64), l.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_triplet_loss():
    rng = np.random.default_rng(2)
    a, p, n = (rng.normal(size=(4, 8)).astype(np.float32) for _ in range(3))
    got = float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), 1.0))
    d = lambda x, y: np.sqrt(((x - y + 1e-6) ** 2).sum(-1))  # noqa: E731
    want = np.maximum(d(a, p) - d(a, n) + 1.0, 0).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_truncated_cds_weights():
    rng = np.random.default_rng(3)
    projs = [
        [rng.normal(size=(2, 8)).astype(np.float32) for _ in range(3)]
        for _ in range(3)
    ]
    w = (0.5, 1.0, 2.0)
    got = float(
        truncated_cds(
            [jnp.asarray(x) for x in projs[0]],
            [jnp.asarray(x) for x in projs[1]],
            [jnp.asarray(x) for x in projs[2]],
            w,
        )
    )
    want = sum(
        wi * float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)))
        for wi, a, p, n in zip(w, projs[0], projs[1], projs[2])
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_heteroscedastic():
    q = jnp.asarray([1.0, 2.0])
    q_hat = jnp.asarray([1.5, 1.5])
    s2 = jnp.asarray([0.5, 2.0])
    want = np.mean([(0.5**2) / 1.0 + np.log(0.5), (0.5**2) / 4.0 + np.log(2.0)])
    np.testing.assert_allclose(float(heteroscedastic_loss(q, q_hat, s2)), want, rtol=1e-5)


def test_weighted_losses():
    rng = np.random.default_rng(4)
    p = rng.normal(size=(3, 4)).astype(np.float32)
    t = rng.normal(size=(3, 4)).astype(np.float32)
    w = np.abs(rng.normal(size=4)).astype(np.float32)
    np.testing.assert_allclose(
        float(weighted_mse(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w))),
        ((p - t) ** 2 * w[None]).mean(), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(weighted_l1(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w))),
        sum(w[i] * np.abs(p[:, i] - t[:, i]).sum() for i in range(4)) / 4,
        rtol=1e-5,
    )


def test_composite_loss_assembly():
    pred, gt, roi, weights, compact, roi_indices = _vol_fixture()
    cfg = LossConfig(rnc=True, ds_reg_weight=1.0, reg_weight=0.0)
    criterion = GenerativeContrastiveLoss(cfg)
    f = jnp.asarray(np.random.default_rng(5).normal(size=(2, 16)).astype(np.float32))
    labels = jnp.asarray(np.random.default_rng(6).uniform(size=(2, 6)).astype(np.float32))
    out = criterion(
        jnp.asarray(pred), jnp.asarray(gt), compact, jnp.asarray(weights),
        rnc_features=f, rnc_labels=labels,
    )
    gen = roi_mse(jnp.asarray(pred), jnp.asarray(gt), compact,
                  jnp.asarray(weights), reduction=None)
    want_total = float(jnp.sum(gen)) + float(rnc_loss(f, labels, 2.0))
    np.testing.assert_allclose(float(out.total), want_total, rtol=1e-5)
    assert out.gen.shape == (2,)


def test_cluster_npair_shapes():
    rng = np.random.default_rng(7)
    a = [jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))]
    p = [jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))]
    n = [jnp.asarray(rng.normal(size=(2, 7, 8)).astype(np.float32))]
    val = float(cluster_npair_loss(a, p, n))
    assert np.isfinite(val) and val > 0
