"""Analysis subsystem + UQ head tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coma_unet_tpu.analysis import (
    analyze_region,
    analyze_sample,
    create_roi_suvr_table,
    export_attention_maps,
    extract_bottleneck_encodings,
    probe_abeta_from_embeddings,
)
from coma_unet_tpu.analysis.embeddings import pca
from coma_unet_tpu.models import ContraAttnUNet
from coma_unet_tpu.models.uq import MLP, AleatoricUncertaintyNet
from coma_unet_tpu.losses import heteroscedastic_loss
from tests.conftest import make_batch


def test_analyze_region_and_sample():
    vol = np.zeros((8, 8, 8))
    roi = np.zeros((8, 8, 8))
    roi[:4] = 17
    vol[:4] = 2.5
    r = analyze_region(vol, roi, 17)
    assert r["mean"] == 2.5 and r["voxels"] == 4 * 64
    df = analyze_sample(vol, roi, roi_indices=[17, 18])
    assert len(df) == 2
    assert df[df.roi_index == 18]["voxels"].iloc[0] == 0


def test_roi_suvr_table(tmp_path):
    samples = [
        {"tau": np.full((1, 4, 4, 4), float(i)), "roi": np.full((1, 4, 4, 4), 17),
         "sample_id": f"s{i}"}
        for i in range(3)
    ]
    out = str(tmp_path / "suvr.csv")
    df = create_roi_suvr_table(samples, roi_indices=[17, 18], out_csv=out)
    assert df.loc["s2", "Left-Hippocampus"] == 2.0
    assert os.path.exists(out)


def test_embedding_probe(tiny_model_config, rng):
    model = ContraAttnUNet(tiny_model_config)
    b = make_batch(rng, b=4)
    b["abeta"] = np.asarray([1.0, 0.0, 1.0, 0.0], np.float32)
    variables = model.init(rng, b["mri"], b["covars"], b["roi_loc"],
                           b["roi_std"], b["roi_compact"], train=False)
    x, abeta = extract_bottleneck_encodings(model, variables, [b])
    assert x.shape[0] == 4 and abeta.shape == (4,)
    res = probe_abeta_from_embeddings(x, abeta, n_features=64)
    assert "r2" in res


def test_pca_center():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 5)) + 10.0
    comps, proj, ev = pca(x, 2, center=True)
    assert comps.shape == (2, 5) and proj.shape == (20, 2)
    assert ev[0] >= ev[1] > 0


def test_export_attention_maps(tiny_model_config, rng, tmp_path):
    model = ContraAttnUNet(tiny_model_config)
    b = make_batch(rng, b=2)
    variables = model.init(rng, b["mri"], b["covars"], b["roi_loc"],
                           b["roi_std"], b["roi_compact"], train=False)
    b["sample_ids"] = ["a/1", "b/2"]
    written = export_attention_maps(model, variables, b, str(tmp_path),
                                    sample_ids=b["sample_ids"])
    # 2 gated levels x 2 samples
    assert len(written) == 4
    from coma_unet_tpu.io.volume import load_nifti_vol

    psi = load_nifti_vol(written[0], resize=False)
    assert psi.min() >= 0 and psi.max() <= 1.0  # sigmoid range


def test_uq_net_and_loss(rng):
    net = AleatoricUncertaintyNet(hidden=16)
    x = jnp.ones((3, 8))
    q_hat = jnp.asarray([1.0, 2.0, 3.0])
    p = net.init(rng, x, q_hat)
    sigma2, conf = net.apply(p, x, q_hat)
    assert sigma2.shape == (3, 1) and (np.asarray(sigma2) > 0).all()
    assert ((np.asarray(conf) > 0) & (np.asarray(conf) < 1)).all()
    q = jnp.asarray([1.5, 2.5, 3.5])
    l = heteroscedastic_loss(q, q_hat, sigma2[:, 0])
    assert np.isfinite(float(l))


def test_mlp_softmax(rng):
    m = MLP(hidden_layers=(16, 8), num_classes=3)
    p = m.init(rng, jnp.ones((2, 10)))
    y = m.apply(p, jnp.ones((2, 10)))
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)
