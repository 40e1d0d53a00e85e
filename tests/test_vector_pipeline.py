"""Legacy ROI-vector regression pipeline (ImageDataset + ConvAttn)."""

import numpy as np
import pandas as pd
import pytest

from coma_unet_tpu.data.image_dataset import ImageDataset
from coma_unet_tpu.models.convattn import ConvAttn, train_convattn


@pytest.fixture()
def table():
    rng = np.random.default_rng(0)
    cols = {f"roi_{i}": rng.uniform(0.5, 2.5, size=40) for i in range(8)}
    return pd.DataFrame(cols)


def test_image_dataset(table):
    ds = ImageDataset(table)
    assert len(ds) == 40
    x, y = ds[0]
    assert x.shape == (8,) and y.shape == (8,)
    ds.set_mean_std(ds.get_mris().mean(0), ds.get_mris().std(0))
    x2, _ = ds[0]
    assert abs(float(np.mean(ds.get_mris().mean(0)))) > 0  # sanity
    assert not np.allclose(x, x2)
    ds.set_col_list(["roi_0", "roi_1"])
    x3, _ = ds[0]
    assert x3.shape == (2,)


def test_convattn_trains(table):
    ds = ImageDataset(table)
    model = ConvAttn(output_size=8)
    weights = np.ones(8, np.float32)
    params, losses = train_convattn(model, ds, weights, epochs=5, lr=1e-3,
                                    batch_size=16)
    assert len(losses) == 5
    assert losses[-1] < losses[0]  # learns the identity-ish mapping a bit
