"""Per-cohort inference presets (`VolumeDataset_Inference.py:163-293`).

The reference ships five ready-made cohort test entry points — UCSF,
unseen-A4, NACC, NACC-nonSCAN, ADNI-with-autopsy — each a hardcoded bundle
of file names under one base directory (paths CSV, CatBoostUQ tau-meta JSON,
KNN MMSCORE JSON, optional CatBoostUQ abeta-covariate JSON, covariate
lookup CSV). This registry packages the same bundles as named presets for
`cli infer --cohort <name> --cohort_dir <base>`, keeping the reference's
exact file names so an existing scripts/ tree drops in unchanged.

Reference deviations (see DEVIATIONS.md):
  * `NACC_test`/`NACC_nonSCAN_test` pass the abeta-JSON *path* where a dict
    is expected (`VolumeDataset_Inference.py:233,260` — indexing a str by
    sample id would raise at the first NaN abeta); here the file is loaded.
  * missing preset files degrade to empty tables (with a warning) instead
    of crashing, so partial bundles still run.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from typing import Optional, Tuple

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class CohortPreset:
    """File-name bundle of one cohort driver (names verbatim from
    `VolumeDataset_Inference.py:163-293`)."""

    name: str
    paths_csv: str
    tau_meta_json: str
    cognition_json: str
    covariate_csv: str
    abeta_json: Optional[str] = None  # UCSF/NACC/NACC-nonSCAN only


COHORT_PRESETS = {
    "ucsf": CohortPreset(
        name="ucsf",
        paths_csv="UCSF_paths.csv",
        tau_meta_json="CatBoostUQ_Tau_Meta_predictions_for_UCSF_data.json",
        cognition_json="KNN_MMSCORE_predictions_for_UCSF_data.json",
        abeta_json="CatBoostUQ_Abeta_Covar_predictions_for_UCSF_data.json",
        covariate_csv="UCSF_data_Covar_lookup.csv",
    ),
    "a4": CohortPreset(  # the unseen-A4 bundle (`A4_test`, :191)
        name="a4",
        paths_csv="unseen_A4_sample_path_lookup.csv",
        tau_meta_json=(
            "CatBoostUQ_Tau_Meta_predictions_for_Additional_A4_data.json"
        ),
        cognition_json="KNN_MMSCORE_predictions_for_unseen_A4_data.json",
        covariate_csv="unseen_A4_Covar_lookup.csv",
    ),
    "nacc": CohortPreset(
        name="nacc",
        paths_csv="NACC_paths.csv",
        tau_meta_json="CatBoostUQ_Tau_Meta_predictions_for_NACC.json",
        cognition_json="KNN_MMSCORE_predictions_for_NACC_data.json",
        abeta_json="CatBoostUQ_Abeta_Covar_predictions_for_NACC.json",
        covariate_csv="NACC_Covar_lookup.csv",
    ),
    "nacc_nonscan": CohortPreset(
        name="nacc_nonscan",
        paths_csv="all_paths.csv",
        tau_meta_json=(
            "CatBoostUQ_Tau_Meta_predictions_for_nonSCAN_NACC.json"
        ),
        cognition_json="KNN_MMSCORE_predictions_for_nonSCAN_NACC.json",
        abeta_json=(
            "CatBoostUQ_Abeta_Covar_predictions_for_nonSCAN_NACC.json"
        ),
        covariate_csv="NACC_nonSCAN_Covar_lookup.csv",
    ),
    "adni_autopsy": CohortPreset(
        name="adni_autopsy",
        paths_csv="ADNI_wAutopsy_paths.csv",
        tau_meta_json=(
            "CatBoostUQ_Tau_Meta_predictions_for_ADNI_wAutopsy.json"
        ),
        cognition_json="KNN_MMSCORE_predictions_for_ADNI_wAutopsy.json",
        covariate_csv="ADNI_wAutopsy_Covar_lookup.csv",
    ),
}


def _load_json(path: str, what: str) -> dict:
    if not os.path.isfile(path):
        logger.warning("cohort preset: missing %s (%s) — empty table",
                       what, path)
        return {}
    with open(path) as f:
        return json.load(f)


def load_cohort_dataset(
    cohort: str,
    base_dir: str,
    pad_dims: Tuple[int, int, int] = (128, 128, 128),
    paths_csv: Optional[str] = None,
    covariate_csv: Optional[str] = None,
):
    """Build the `InferenceVolumeDataset` for a named cohort preset.

    `paths_csv` / `covariate_csv` override the preset's file names (for
    trees that renamed them); all other bundle files resolve inside
    `base_dir`. Mirrors the construction in each `*_test` driver
    (`VolumeDataset_Inference.py:163-293`): tau-meta + cognition tables
    always, abeta-fallback table for the cohorts that ship one.
    """
    from coma_unet_tpu.data.covariates import CovariateTable, PredictionTable
    from coma_unet_tpu.data.datasets import InferenceVolumeDataset

    if cohort not in COHORT_PRESETS:
        raise ValueError(
            f"unknown cohort {cohort!r}; choose from "
            f"{sorted(COHORT_PRESETS)}"
        )
    preset = COHORT_PRESETS[cohort]
    lookup = paths_csv or os.path.join(base_dir, preset.paths_csv)
    cov_csv = covariate_csv or os.path.join(base_dir, preset.covariate_csv)
    tau_meta = PredictionTable(
        _load_json(os.path.join(base_dir, preset.tau_meta_json), "tau-meta")
    )
    cognition = _load_json(
        os.path.join(base_dir, preset.cognition_json), "cognition"
    )
    abeta_fallback = {}
    if preset.abeta_json:
        abeta_fallback = _load_json(
            os.path.join(base_dir, preset.abeta_json), "abeta fallback"
        )
    return InferenceVolumeDataset(
        lookup, CovariateTable(cov_csv), meta_tau_table=tau_meta,
        cognition_table=cognition, abeta_fallback_table=abeta_fallback,
        pad_dims=pad_dims,
    )
