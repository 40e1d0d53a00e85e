"""Dataset / pipeline tests over synthetic NIfTI fixtures."""


import numpy as np
import pandas as pd
import pytest

from coma_unet_tpu.config import ROI_INDICES
from coma_unet_tpu.data import (
    ClusterVolumeDataset,
    CombinedVolumeDataset,
    ContrastiveVolumeDataset,
    CovariateTable,
    CustomSampler,
    DataLoader,
    InferenceVolumeDataset,
    PredictedMetaTauDataset,
    PredictionTable,
    VolumeDataset,
    collate,
    extract_id,
)
from coma_unet_tpu.data.covariates import QuartileTable


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    """8 synthetic subjects: 16^3 native-space volumes at 2 mm + covar CSV +
    quartile CSV + prediction JSON (via `data.synthetic.make_synthetic_cohort`)."""
    from coma_unet_tpu.data.synthetic import make_synthetic_cohort

    root = tmp_path_factory.mktemp("cohort")
    return make_synthetic_cohort(str(root))


def test_extract_id():
    p = "/home/jagust/xnat/xnp/sshfs/xnat_data/adni/000-S-0059/PET_2017-12-12_FTP/analysis/rnu.nii"
    assert extract_id(p) == "000-S-0059/PET_2017-12-12_FTP"
    p2 = "/x/a4/B10423472/PET_2017-01-01_FTP/analysis/suvr_cereg.nii"
    assert extract_id(p2) == "B10423472"


def test_volume_dataset(cohort):
    ds = VolumeDataset(cohort["lookup"])
    assert len(ds) == 8
    item = ds[0]
    assert item["mri"].shape == (1, 128, 128, 128)  # padded to default 128^3
    assert item["tau"].shape == (1, 128, 128, 128)
    # native space: MRI masked where ROI == 0
    assert (item["mri"][item["roi"] == 0] == 0).all()


def test_covariate_dataset(cohort):
    ds = PredictedMetaTauDataset(
        cohort["lookup"],
        CovariateTable(cohort["cov"]),
        QuartileTable(cohort["quart"]),
        meta_tau_table=PredictionTable(cohort["preds"]),
        pad_dims=(16, 16, 16),
    )
    item = ds[0]
    a = item["anchor"]
    assert a["covars"].shape == (6,)
    assert a["covars"][0] in (0.0, 1.0)     # abeta
    assert a["covars"][5] == pytest.approx(1.0)  # predicted meta tau (i=0)
    # positive shares abeta + quartile
    pos_sid = item["pos"]["sample_id"]
    anchor_sid = a["sample_id"]
    cov = CovariateTable(cohort["cov"])
    qt = QuartileTable(cohort["quart"])
    assert cov.get(pos_sid)[0] == cov.get(anchor_sid)[0]
    assert qt.quartile(pos_sid) == qt.quartile(anchor_sid)
    assert pos_sid != anchor_sid


def test_cluster_negatives(cohort):
    ds = ClusterVolumeDataset(
        cohort["lookup"], CovariateTable(cohort["cov"]),
        QuartileTable(cohort["quart"]), pad_dims=(16, 16, 16),
    )
    item = ds[0]
    assert 1 <= len(item["negs"]) <= 7


def test_collate_and_loader(cohort):
    preds = PredictionTable(cohort["preds"])
    ds = PredictedMetaTauDataset(
        cohort["lookup"], CovariateTable(cohort["cov"]),
        QuartileTable(cohort["quart"]), meta_tau_table=preds,
        pad_dims=(16, 16, 16),
    )
    loader = DataLoader(ds, batch_size=4, predictions=preds, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["mri"].shape == (4, 1, 16, 16, 16)
    assert b["roi_compact"].shape == (4, 16, 16, 16)
    assert b["roi_compact"].max() <= len(ROI_INDICES)
    assert b["covars"].shape == (4, 6)
    assert b["roi_loc"].shape == (4, len(ROI_INDICES))
    # painted loc for subject i is i in the first 5 ROIs
    assert set(np.unique(b["roi_loc"][:, :5])) <= set(float(i) for i in range(8))
    assert b["roi_loc"][:, 5:].sum() == 0


def test_combined_dataset(cohort):
    ds = CombinedVolumeDataset(
        cohort["lookup"], CovariateTable(cohort["cov"]),
        meta_tau_table=PredictionTable(cohort["preds"]),
        cognition_table={},
        pad_dims=(16, 16, 16),
    )
    item = ds[0]
    assert item["covars"].shape == (6,)
    assert item["covars"][5] == pytest.approx(1.0)


def test_inference_dataset(cohort):
    ds = InferenceVolumeDataset(
        cohort["lookup"], CovariateTable(cohort["cov"]),
        meta_tau_table=PredictionTable(cohort["preds"]),
        pad_dims=(16, 16, 16),
    )
    item = ds[0]
    np.testing.assert_array_equal(item["mri"], item["tau"])  # placeholder
    assert item["covars"].shape == (6,)


def test_custom_sampler_skips_nan_abeta(cohort):
    cov_df = pd.read_csv(cohort["cov"])
    cov_df.loc[0, "Abeta_Covar"] = np.nan
    ds = ContrastiveVolumeDataset(
        cohort["lookup"], CovariateTable(cov_df), QuartileTable(cohort["quart"]),
        pad_dims=(16, 16, 16),
    )
    sampler = CustomSampler(ds)
    # nan-abeta maps to -1.0 (not nan) by CovariateTable, so all kept; check
    # explicit skip_ids path
    sampler2 = CustomSampler(ds, skip_ids=[ds.sample_id(1)])
    assert len(sampler2) == len(sampler) - 1
