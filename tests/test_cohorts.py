"""Per-cohort inference preset tests (`VolumeDataset_Inference.py:163-293`)."""

import json
import os

import numpy as np
import pytest

from coma_unet_tpu.data.cohorts import COHORT_PRESETS, load_cohort_dataset
from coma_unet_tpu.data.synthetic import make_synthetic_cohort_bundle


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    root = tmp_path_factory.mktemp("ucsf_bundle")
    return make_synthetic_cohort_bundle(str(root), "ucsf", n_subjects=4,
                                        size=16)


def test_registry_covers_all_five_reference_drivers():
    assert set(COHORT_PRESETS) == {
        "ucsf", "a4", "nacc", "nacc_nonscan", "adni_autopsy"
    }
    # the reference's ab-covar fallback table exists exactly for
    # UCSF/NACC/NACC-nonSCAN (`VolumeDataset_Inference.py:171,233,260`)
    assert all(
        (COHORT_PRESETS[c].abeta_json is not None)
        == (c in ("ucsf", "nacc", "nacc_nonscan"))
        for c in COHORT_PRESETS
    )


def test_cohort_dataset_covariates(bundle):
    ds = load_cohort_dataset("ucsf", bundle, pad_dims=(16, 16, 16))
    assert len(ds) == 4
    item = ds[1]
    covars = item["covars"]
    assert covars.shape == (6,)
    assert covars[0] == 1.0                      # abeta (i=1 -> 1)
    assert covars[4] == pytest.approx(21.0 / 30)  # KNN MMSCORE / 30
    assert covars[5] == pytest.approx(2.0)        # CatBoostUQ Tau_Meta loc
    # tau slot carries the MRI placeholder (`VolumeDataset_Inference.py:145`)
    np.testing.assert_array_equal(item["tau"], item["mri"])
    # MRI masked by ROI
    assert (item["mri"][item["roi"] == 0] == 0).all()


def test_cohort_abeta_fallback(bundle):
    """Subject 0 has NaN abeta in the covar CSV; the CatBoostUQ abeta
    prediction JSON must fill it (`VolumeDataset_Inference.py:136-137`)."""
    ds = load_cohort_dataset("ucsf", bundle, pad_dims=(16, 16, 16))
    item = ds[0]
    assert item["abeta"] == 1.0
    assert item["covars"][0] == 1.0


def test_cohort_missing_files_degrade(tmp_path):
    """A bundle missing its JSONs still constructs (empty tables)."""
    import pandas as pd

    from coma_unet_tpu.io.nifti import write_nifti

    d = tmp_path / "adni_autopsy"
    d.mkdir()
    vol = np.zeros((8, 8, 8), np.float32)
    vol[2:6] = 1.0
    write_nifti(str(d / "mri.nii"), vol, spacing=(2.0,) * 3)
    preset = COHORT_PRESETS["adni_autopsy"]
    pd.DataFrame([{"SAMPLE_ID": "X1", "MRI": str(d / "mri.nii"),
                   "roi": str(d / "mri.nii")}]).to_csv(
        str(d / preset.paths_csv), index=False)
    pd.DataFrame([{"SAMPLE_ID": "X1", "Abeta_Covar": 0.0, "Age": 70,
                   "PTGENDER": "Male", "Education": 16}]).to_csv(
        str(d / preset.covariate_csv), index=False)
    ds = load_cohort_dataset("adni_autopsy", str(d), pad_dims=(8, 8, 8))
    item = ds[0]
    assert item["covars"].shape == (6,)
    assert item["covars"][5] == 0.0  # meta-tau table empty -> 0


def test_unknown_cohort_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown cohort"):
        load_cohort_dataset("nope", str(tmp_path))


def test_cli_infer_cohort(bundle, tmp_path):
    """`cli infer --cohort ucsf` end to end on the synthetic bundle."""
    from coma_unet_tpu.cli import main

    cfg = {
        "model": {
            "channels": [4, 8], "strides": [2, 2], "latent_spaces": [16, 16],
            "prompt_shape": [16, 16, 16], "num_experts": 2,
            "compute_dtype": "float32",
        },
        "data": {"volume_shape": [16, 16, 16]},
        "save_path": str(tmp_path / "results"),
    }
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    out_dir = str(tmp_path / "synth")
    rc = main([
        "infer", "--config", cfg_path, "--cohort", "ucsf",
        "--cohort_dir", bundle, "--out_dir", out_dir,
    ])
    assert rc == 0
    outs = [f for f in os.listdir(out_dir) if f.endswith("_synth_tau.nii")]
    assert len(outs) == 4


def test_cli_infer_cohort_requires_dir(tmp_path):
    from coma_unet_tpu.cli import main

    rc = main(["infer", "--cohort", "ucsf"])
    assert rc == 2
