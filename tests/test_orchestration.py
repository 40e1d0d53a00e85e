"""Split orchestration wrappers."""

import numpy as np
import pandas as pd
import pytest

from coma_unet_tpu.data.orchestration import (
    check_for_longitudinal,
    create_dataloader,
    load_single_split_datasets,
    load_split_datasets,
)
from coma_unet_tpu.io.volume import reduce_image_size
from tests.test_data import cohort  # noqa: F401


def test_load_split_datasets(cohort, tmp_path):  # noqa: F811
    df = pd.read_csv(cohort["lookup"])
    df.to_csv(str(tmp_path / "training_lookup_2.csv"), index=False)
    df.iloc[:3].to_csv(str(tmp_path / "test_lookup_2.csv"), index=False)
    train, test = load_split_datasets(
        str(tmp_path), 2, cohort["cov"], cohort["quart"], cohort["preds"],
        pad_dims=(16, 16, 16),
    )
    assert len(train) == 8 and len(test) == 3
    item = train[0]
    assert item["anchor"]["covars"].shape == (6,)


def test_single_split_assert(cohort, tmp_path):  # noqa: F811
    df = pd.read_csv(cohort["lookup"])
    p = str(tmp_path / "a.csv")
    df.to_csv(p, index=False)
    train, test = load_single_split_datasets(
        p, p, cohort["cov"], expected_sizes=(8, 8), pad_dims=(16, 16, 16)
    )
    with pytest.raises(AssertionError):
        load_single_split_datasets(p, p, cohort["cov"],
                                   expected_sizes=(1695, 444))


def test_create_dataloader_contra_sampler(cohort):  # noqa: F811
    from coma_unet_tpu.data.covariates import CovariateTable, QuartileTable
    from coma_unet_tpu.data.datasets import ClusterVolumeDataset

    ds = ClusterVolumeDataset(
        cohort["lookup"], CovariateTable(cohort["cov"]),
        QuartileTable(cohort["quart"]), pad_dims=(16, 16, 16),
    )
    loader = create_dataloader(ds, 2, shuffle=True, contra=True)
    assert loader.sampler is not None
    batch = next(iter(loader))
    assert batch["mri"].shape[0] == 2


def test_check_for_longitudinal():
    paths = [
        "/x/adni/001-S-1/PET_2020_FTP/a/rnu.nii",
        "/x/adni/001-S-1/PET_2021_FTP/a/rnu.nii",
        "/x/adni/002-S-2/PET_2020_FTP/a/rnu.nii",
    ]
    longi = check_for_longitudinal(paths)
    assert longi == {"001-S-1": 2}


def test_reduce_image_size():
    v = np.zeros((1, 8, 8, 8))
    v[0, 2:5, 3:6, 1:4] = 1.0
    out = reduce_image_size(v)
    assert out.shape == (1, 3, 3, 3)
    assert out.sum() == 27
