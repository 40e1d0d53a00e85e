"""ROI ops vs naive per-ROI mask loops (the reference's formulation)."""

import jax.numpy as jnp
import numpy as np

from coma_unet_tpu.ops.roi import (
    compact_roi,
    make_roi_lut,
    paint_roi_values,
    roi_counts,
    roi_sums,
    roi_weight_mask,
)


def _fixture(seed=0, b=2, s=8):
    rng = np.random.default_rng(seed)
    roi_indices = [17, 18, 1001, 2034, 54]
    labels = np.array([0] + roi_indices)
    roi = labels[rng.integers(0, len(labels), size=(b, s, s, s))]
    vals = rng.normal(size=(b, s, s, s)).astype(np.float32)
    return roi_indices, roi, vals


def test_compact_and_sums_match_naive():
    roi_indices, roi, vals = _fixture()
    lut = make_roi_lut(roi_indices)
    compact = compact_roi(jnp.asarray(roi), lut)
    sums = np.asarray(roi_sums(jnp.asarray(vals), compact, len(roi_indices)))
    counts = np.asarray(roi_counts(compact, len(roi_indices)))
    for b in range(roi.shape[0]):
        for i, idx in enumerate(roi_indices):
            mask = roi[b] == idx
            np.testing.assert_allclose(sums[b, i], vals[b][mask].sum(), rtol=1e-5)
            assert counts[b, i] == mask.sum()


def test_paint_roi_values():
    roi_indices, roi, _ = _fixture()
    lut = make_roi_lut(roi_indices)
    compact = compact_roi(jnp.asarray(roi), lut)
    b = roi.shape[0]
    table = np.arange(1, b * len(roi_indices) + 1, dtype=np.float32).reshape(
        b, len(roi_indices)
    )
    painted = np.asarray(paint_roi_values(compact, jnp.asarray(table)))
    for bb in range(b):
        for i, idx in enumerate(roi_indices):
            mask = roi[bb] == idx
            assert (painted[bb][mask] == table[bb, i]).all()
        assert (painted[bb][roi[bb] == 0] == 0.0).all()


def test_roi_weight_mask():
    roi_indices, roi, _ = _fixture()
    lut = make_roi_lut(roi_indices)
    compact = compact_roi(jnp.asarray(roi), lut)
    w = jnp.asarray(np.arange(1, len(roi_indices) + 1, dtype=np.float32) * 10)
    mask = np.asarray(roi_weight_mask(compact, w, background=1.0))
    for i, idx in enumerate(roi_indices):
        assert (mask[roi == idx] == (i + 1) * 10).all()
    assert (mask[roi == 0] == 1.0).all()
