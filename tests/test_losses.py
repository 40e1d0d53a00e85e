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


# ---------------------------------------------------------------------------
# valid-mask semantics: the loader wrap-pads the last partial batch with
# duplicate rows; masked losses must EXACTLY equal the loss over the true
# (valid) subset — the reference trains on the true partial torch batch
# (`attn_unet_data_parallel.py:779`).


def test_rnc_loss_valid_mask_matches_subset():
    rng = np.random.default_rng(11)
    f = rng.normal(size=(6, 8)).astype(np.float32)
    lab = rng.uniform(size=(6, 6)).astype(np.float32)
    # padded rows duplicate rows 0/1 (the loader's wrap-pad pattern)
    f[4], f[5] = f[0], f[1]
    lab[4], lab[5] = lab[0], lab[1]
    valid = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    got = float(rnc_loss(jnp.asarray(f), jnp.asarray(lab), valid=valid))
    want = float(rnc_loss(jnp.asarray(f[:4]), jnp.asarray(lab[:4])))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rnc_loss_valid_mask_grads_match_subset():
    rng = np.random.default_rng(12)
    f = rng.normal(size=(5, 8)).astype(np.float32)
    lab = rng.uniform(size=(5, 1)).astype(np.float32)
    f[4], lab[4] = f[0], lab[0]
    valid = jnp.asarray([1, 1, 1, 1, 0], jnp.float32)
    g_mask = jax.grad(lambda x: rnc_loss(x, jnp.asarray(lab), valid=valid))(
        jnp.asarray(f)
    )
    g_sub = jax.grad(lambda x: rnc_loss(x, jnp.asarray(lab[:4])))(
        jnp.asarray(f[:4])
    )
    np.testing.assert_allclose(np.asarray(g_mask[:4]), np.asarray(g_sub),
                               rtol=1e-4, atol=1e-7)
    # padded rows contribute zero gradient
    np.testing.assert_allclose(np.asarray(g_mask[4]), 0.0, atol=1e-8)


def test_triplet_loss_valid_mask_matches_subset():
    rng = np.random.default_rng(13)
    a, p, n = (rng.normal(size=(6, 8)).astype(np.float32) for _ in range(3))
    valid = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    got = float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                             valid=valid))
    want = float(triplet_loss(jnp.asarray(a[:4]), jnp.asarray(p[:4]),
                              jnp.asarray(n[:4])))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_composite_valid_mask_matches_subset():
    """Full criterion (tCDS mode + live pred-space slot) on a wrap-padded
    batch with `valid` == the criterion on the true partial batch."""
    pred, gt, roi, weights, compact, roi_indices = _vol_fixture(seed=21, b=4)
    rng = np.random.default_rng(22)
    # wrap-pad: rows 2/3 duplicate rows 0/1
    pad = lambda x: np.concatenate([x, x[:2]], axis=0)  # noqa: E731
    levels = 3
    projs = [
        [rng.normal(size=(4, 16)).astype(np.float32) for _ in range(levels)]
        for _ in range(3)
    ]
    finals = [rng.normal(size=(4, 16)).astype(np.float32) for _ in range(3)]
    cfg = LossConfig(rnc=False, reg_weight=0.7, ds_reg_weight=1.0,
                     cds_weights=(0.0, 1.0, 4.0))
    criterion = GenerativeContrastiveLoss(cfg)

    from coma_unet_tpu.ops.roi import compact_roi, make_roi_lut

    lut = make_roi_lut(roi_indices)
    compact_pad = compact_roi(jnp.asarray(pad(roi)), lut)
    valid = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    got = criterion(
        jnp.asarray(pad(pred)), jnp.asarray(pad(gt)), compact_pad,
        jnp.asarray(weights),
        anchor_projs=[jnp.asarray(pad(p)) for p in projs[0]],
        pos_projs=[jnp.asarray(pad(p)) for p in projs[1]],
        neg_projs=[jnp.asarray(pad(p)) for p in projs[2]],
        final_reprs=tuple(jnp.asarray(pad(f)) for f in finals),
        valid=valid,
    )
    want = criterion(
        jnp.asarray(pred), jnp.asarray(gt), compact, jnp.asarray(weights),
        anchor_projs=[jnp.asarray(p) for p in projs[0]],
        pos_projs=[jnp.asarray(p) for p in projs[1]],
        neg_projs=[jnp.asarray(p) for p in projs[2]],
        final_reprs=tuple(jnp.asarray(f) for f in finals),
    )
    np.testing.assert_allclose(float(got.total), float(want.total), rtol=1e-5)
    np.testing.assert_allclose(float(got.pred_space), float(want.pred_space),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got.tcds), float(want.tcds), rtol=1e-5)


def test_rnc_loss_single_sample_is_zero_not_nan():
    # b=1 has no ranking pairs (normalizer n*(n-1)=0) -- the template-space
    # 216^3 trainer runs b=1 (r3 PROBE_216); the loss must be 0 with a
    # finite (zero) gradient rather than 0/0 = NaN.
    f = jnp.asarray(np.random.default_rng(13).normal(size=(1, 8)),
                    jnp.float32)
    lab = jnp.ones((1, 6), jnp.float32)
    val = float(rnc_loss(f, lab))
    assert val == 0.0
    g = jax.grad(lambda x: rnc_loss(x, lab))(f)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0)
