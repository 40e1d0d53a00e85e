"""Synthetic cohort generation.

Builds a miniature ADNI-layout cohort on disk — NIfTI volumes (MRI / tau /
FreeSurfer-labelled ROI), covariate CSV, abeta-x-quartile CSV, and a
CatBoost-style per-ROI prediction JSON — matching the lookup/covariate
schemas the reference consumes (`VolumeDataset.py:107-109,347,352`,
`attn_unet_data_parallel.py:708-710`). Used by the test fixtures, the
multi-chip dry run, and the `run.sh`-equivalent launcher, since the real
ADNI/A4 data cannot ship with the repo.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np
import pandas as pd

from coma_unet_tpu.config import ROI_INDICES, ROI_INDEX_TO_NAME
from coma_unet_tpu.io.nifti import write_nifti


def make_synthetic_cohort(
    root: str,
    n_subjects: int = 8,
    size: int = 16,
    spacing: float = 2.0,
    num_rois: int = 5,
    seed: int = 0,
) -> Dict[str, str]:
    """Write an n-subject synthetic cohort under `root`.

    Returns {"root", "lookup", "cov", "quart", "preds"} paths. Volumes are
    `size`^3 at `spacing` mm; ROI volumes carry the first `num_rois` labels of
    `ROI_INDICES` (plus background 0); ids follow the ADNI xnat path layout so
    `extract_id` parses them.
    """
    rng = np.random.default_rng(seed)
    rows, cov_rows, quart_rows = [], [], []
    preds: Dict[str, dict] = {}
    labels = [0] + list(ROI_INDICES[:num_rois])
    for i in range(n_subjects):
        sid = f"{i:03d}-S-{1000 + i}"
        d = os.path.join(root, "adni", sid, "PET_2020-01-01_FTP", "analysis")
        os.makedirs(d, exist_ok=True)
        mri = rng.uniform(0, 255, size=(size,) * 3).astype(np.float32)
        tau = rng.uniform(0, 2, size=(size,) * 3).astype(np.float32)
        roi = np.asarray(labels)[
            rng.integers(0, len(labels), size=(size,) * 3)
        ].astype(np.float32)
        for name, vol in (("rnu.nii", mri), ("suvr_cereg.nii", tau),
                          ("raparc+aseg.nii", roi)):
            write_nifti(os.path.join(d, name), np.transpose(vol, (2, 1, 0)),
                        spacing=(spacing,) * 3)
        key = f"{sid}/PET_2020-01-01_FTP"
        rows.append({
            "MRI": os.path.join(d, "rnu.nii"),
            "tau": os.path.join(d, "suvr_cereg.nii"),
            "roi": os.path.join(d, "raparc+aseg.nii"),
        })
        cov_rows.append({
            "ADNI_ID": key,
            "Abeta_Covar": i % 2,
            "Age": 60 + i, "Sex": "M" if i % 2 else "F",
            "Education": 12 + i % 5, "Cognition": 20 + i,
        })
        quart_rows.append({"ADNI_ID": key, "quartile_lub": (i % 4) + 1})
        preds[key] = {
            ROI_INDEX_TO_NAME[r]: {"loc": float(i), "std": 0.1}
            for r in ROI_INDICES[:num_rois]
        }
        preds[key]["Tau_Meta"] = {"loc": 1.0 + i, "std": 0.2}

    lookup_csv = os.path.join(root, "lookup.csv")
    pd.DataFrame(rows).to_csv(lookup_csv, index=False)
    cov_csv = os.path.join(root, "covars.csv")
    pd.DataFrame(cov_rows).to_csv(cov_csv, index=False)
    quart_csv = os.path.join(root, "quarts.csv")
    pd.DataFrame(quart_rows).to_csv(quart_csv, index=False)
    pred_json = os.path.join(root, "preds.json")
    with open(pred_json, "w") as f:
        json.dump(preds, f)
    return dict(root=root, lookup=lookup_csv, cov=cov_csv, quart=quart_csv,
                preds=pred_json)


def make_synthetic_cohort_bundle(
    root: str,
    cohort: str = "ucsf",
    n_subjects: int = 4,
    size: int = 16,
    spacing: float = 2.0,
    seed: int = 0,
) -> str:
    """Write a per-cohort inference preset bundle under `root` using the
    reference's exact file names (`VolumeDataset_Inference.py:163-293`), so
    `cli infer --cohort <name> --cohort_dir <root>` runs against it.

    MRI-only samples (no tau target): paths CSV with SAMPLE_ID/MRI/roi,
    covariate lookup CSV (one NaN abeta to exercise the fallback table),
    tau-meta + cognition JSONs, and — for cohorts that ship one — the abeta
    fallback JSON. Returns `root`."""
    from coma_unet_tpu.data.cohorts import COHORT_PRESETS

    preset = COHORT_PRESETS[cohort]
    rng = np.random.default_rng(seed)
    rows, cov_rows = [], []
    tau_meta: Dict[str, dict] = {}
    cognition: Dict[str, float] = {}
    abeta: Dict[str, float] = {}
    for i in range(n_subjects):
        sid = f"COH{i:03d}"
        d = os.path.join(root, "scans", sid)
        os.makedirs(d, exist_ok=True)
        mri = rng.uniform(0, 255, size=(size,) * 3).astype(np.float32)
        roi = rng.integers(0, 3, size=(size,) * 3).astype(np.float32)
        write_nifti(os.path.join(d, "mri.nii"),
                    np.transpose(mri, (2, 1, 0)), spacing=(spacing,) * 3)
        write_nifti(os.path.join(d, "roi.nii"),
                    np.transpose(roi, (2, 1, 0)), spacing=(spacing,) * 3)
        rows.append({"SAMPLE_ID": sid,
                     "MRI": os.path.join(d, "mri.nii"),
                     "roi": os.path.join(d, "roi.nii")})
        cov_rows.append({
            "SAMPLE_ID": sid,
            # subject 0 has missing abeta -> exercises the fallback JSON
            "Abeta_Covar": float("nan") if i == 0 else i % 2,
            "Age": 60 + i, "PTGENDER": "Male" if i % 2 else "Female",
            "Education": 12 + i,
        })
        tau_meta[sid] = {"Tau_Meta": {"loc": 1.0 + i, "std": 0.2}}
        cognition[sid] = 20.0 + i
        abeta[sid] = 1.0
    pd.DataFrame(rows).to_csv(os.path.join(root, preset.paths_csv),
                              index=False)
    pd.DataFrame(cov_rows).to_csv(os.path.join(root, preset.covariate_csv),
                                  index=False)
    with open(os.path.join(root, preset.tau_meta_json), "w") as f:
        json.dump(tau_meta, f)
    with open(os.path.join(root, preset.cognition_json), "w") as f:
        json.dump(cognition, f)
    if preset.abeta_json:
        with open(os.path.join(root, preset.abeta_json), "w") as f:
            json.dump(abeta, f)
    return root
