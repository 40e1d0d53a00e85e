"""Sliding-window inference tests."""

import jax
import numpy as np
import pytest

from coma_unet_tpu.infer import (
    gaussian_importance_map,
    make_infer_fn,
    sliding_window_inference,
)
from coma_unet_tpu.models import ContraAttnUNet
from tests.conftest import make_batch


def test_gaussian_map():
    w = gaussian_importance_map((8, 8, 8))
    assert w.shape == (8, 8, 8)
    assert w.max() == pytest.approx(1.0)
    assert w[0, 0, 0] < w[4, 4, 4]


def test_sliding_window_covers_larger_volume(tiny_model_config, rng):
    model = ContraAttnUNet(tiny_model_config)
    b = make_batch(rng, b=1, s=16)
    variables = model.init(rng, b["mri"], b["covars"], b["roi_loc"],
                           b["roi_std"], b["roi_compact"], train=False)
    infer = make_infer_fn(model)

    big = np.random.default_rng(0).uniform(
        0, 1, size=(1, 1, 24, 24, 24)
    ).astype(np.float32)
    roi = np.zeros((1, 24, 24, 24), np.int32)
    out = sliding_window_inference(
        infer, variables, big, np.asarray(b["covars"][:1]),
        np.asarray(b["roi_loc"][:1]), np.asarray(b["roi_std"][:1]), roi,
        patch_size=(16, 16, 16), overlap=0.25, batch_size=2,
    )
    assert out.shape == (1, 1, 24, 24, 24)
    assert np.isfinite(out).all()
    assert (out >= 0).all()  # model ends in ReLU


def test_sliding_window_identity_on_exact_patch(tiny_model_config, rng):
    """A volume exactly one patch big must equal the direct forward."""
    model = ContraAttnUNet(tiny_model_config)
    b = make_batch(rng, b=1, s=16)
    variables = model.init(rng, b["mri"], b["covars"], b["roi_loc"],
                           b["roi_std"], b["roi_compact"], train=False)
    infer = make_infer_fn(model)
    direct = np.asarray(infer(variables, b["mri"], b["covars"], b["roi_loc"],
                              b["roi_std"], b["roi_compact"]))
    sw = sliding_window_inference(
        infer, variables, np.asarray(b["mri"]), np.asarray(b["covars"]),
        np.asarray(b["roi_loc"]), np.asarray(b["roi_std"]),
        np.asarray(b["roi_compact"]), patch_size=(16, 16, 16),
    )
    np.testing.assert_allclose(sw, direct, rtol=1e-4, atol=1e-5)
