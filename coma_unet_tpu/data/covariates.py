"""Covariate and prediction tables (SURVEY §2.2).

`CovariateTable` replicates `CovariateVolumeDataset`'s CSV handling
(`VolumeDataset.py:339-433`): columns ADNI_ID / Abeta_Covar / Age / Sex /
Education / Cognition, Sex mapped {M:0, F:1}, MinMax scaling of
Age/Education/Cognition over the table, missing abeta -> -1, optional
Tau_Meta append; plus the A4 schema (BID/ABETA, `VolumeDataset_A4.py`), the
inference-time column aliasing (PTGENDER->Sex, MMSCORE->Cognition scaled /30,
`VolumeDataset_Inference.py:78-81,132`), and the abeta-x-tau-quartile lookup
(`ADNI_ID_ABETA_TAU_QUARTS.csv`, `VolumeDataset.py:347`).

`PredictionTable` wraps the CatBoost/NGBoost per-ROI tau prediction dicts
(`attn_unet_data_parallel.py:708-710,1135-1137`): id -> {roi_name: {'loc':
m, 'std': s}} JSON (or the NGBoost .npy pickle), exported as dense [R] arrays
in ROI_INDICES order for the jittable modulator path.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from coma_unet_tpu.config import ROI_INDICES, ROI_INDEX_TO_NAME

_COLUMN_ALIASES = {
    "PTGENDER": "Sex",
    "MMSCORE": "Cognition",
    "BID": "ADNI_ID",
    "ABETA": "Abeta_Covar",
    # cohort-preset covariate lookups key by SAMPLE_ID
    # (`VolumeDataset_Inference.py:74-76`)
    "SAMPLE_ID": "ADNI_ID",
}


def _check_nan(value: float, fallback: float) -> float:
    """`check_nan` semantics: replace NaN with the table mean. (The reference's
    inference variant guards on the *wrong variable* at
    `VolumeDataset_Inference.py:126,129`; we guard on the value itself.)"""
    return fallback if value is None or (isinstance(value, float) and math.isnan(value)) else value


class CovariateTable:
    """id -> (abeta, covars[5]) with MinMax-scaled continuous columns."""

    def __init__(
        self,
        csv_path_or_df,
        id_column: str = "ADNI_ID",
        scale_education_by_30: bool = False,
        alias_columns: bool = True,
    ):
        df = (
            csv_path_or_df
            if isinstance(csv_path_or_df, pd.DataFrame)
            else pd.read_csv(csv_path_or_df)
        )
        if alias_columns:
            df = df.rename(columns=_COLUMN_ALIASES)
        if id_column not in df.columns and "ADNI_ID" in df.columns:
            id_column = "ADNI_ID"
        self.df = df.set_index(df[id_column].astype(str))

        # Sex -> {M:0, F:1} (`VolumeDataset.py:354`)
        if "Sex" in self.df.columns and not pd.api.types.is_numeric_dtype(
            self.df["Sex"]
        ):
            self.df["Sex"] = self.df["Sex"].map(
                lambda s: {"M": 0.0, "F": 1.0}.get(str(s).strip().upper()[:1], np.nan)
            )

        # MinMax scale Age/Education/Cognition over the table (`:354-358`)
        self._scaled = {}
        for col in ("Age", "Education", "Cognition"):
            if col in self.df.columns:
                v = pd.to_numeric(self.df[col], errors="coerce")
                lo, hi = v.min(), v.max()
                rng = (hi - lo) if hi > lo else 1.0
                self.df[col + "_scaled"] = (v - lo) / rng
                self._scaled[col] = (float(lo), float(hi))
        if scale_education_by_30 and "Education" in self.df.columns:
            v = pd.to_numeric(self.df["Education"], errors="coerce")
            self.df["Education_scaled"] = v / 30.0
        # NaN fallbacks must live in the same space as the feature `get`
        # reads: the reference computes age_mean/edu_mean AFTER scaling
        # (`VolumeDataset_Inference.py:95-99`), so a missing Age yields ~0.5,
        # not ~73.
        self.means = {}
        for c in ("Age", "Sex", "Education", "Cognition", "Abeta_Covar"):
            if c in self.df.columns:
                src = c + "_scaled" if c + "_scaled" in self.df.columns else c
                self.means[c] = float(
                    pd.to_numeric(self.df[src], errors="coerce").mean()
                )

    def __contains__(self, sid: str) -> bool:
        return str(sid) in self.df.index

    def get(self, sid: str, meta_tau: Optional[float] = None) -> Tuple[float, np.ndarray]:
        """Returns (abeta, covars) with covars = [abeta, age, sex, edu, cog]
        (+ meta_tau appended when given). Missing abeta -> -1
        (`VolumeDataset.py:377`); missing continuous values -> table mean."""
        sid = str(sid)
        if sid in self.df.index:
            row = self.df.loc[sid]
            if isinstance(row, pd.DataFrame):
                row = row.iloc[0]
            abeta = row.get("Abeta_Covar", np.nan)
            abeta = -1.0 if pd.isna(abeta) else float(abeta)
            vals = []
            for col in ("Age", "Sex", "Education", "Cognition"):
                scaled_col = col + "_scaled" if col != "Sex" else col
                v = row.get(scaled_col, np.nan)
                v = _check_nan(
                    float(v) if not pd.isna(v) else float("nan"),
                    self.means.get(col, 0.0),
                )
                vals.append(float(v))
        else:
            abeta = -1.0
            vals = [self.means.get(c, 0.0) for c in ("Age", "Sex", "Education", "Cognition")]
        covars = np.asarray([abeta] + vals, dtype=np.float32)
        if meta_tau is not None:
            covars = np.concatenate([covars, np.asarray([meta_tau], np.float32)])
        return abeta, covars


class QuartileTable:
    """id -> tau quartile (`quartile_lub`) from ADNI_ID_ABETA_TAU_QUARTS.csv
    (`VolumeDataset.py:347`, `criterions.py:398-406`)."""

    def __init__(self, csv_path_or_df, id_column: str = "ADNI_ID",
                 quartile_column: str = "quartile_lub"):
        df = (
            csv_path_or_df
            if isinstance(csv_path_or_df, pd.DataFrame)
            else pd.read_csv(csv_path_or_df)
        )
        self.df = df
        self.map: Dict[str, int] = {
            str(r[id_column]): int(r[quartile_column])
            for _, r in df.iterrows()
            if not pd.isna(r[quartile_column])
        }
        if "Abeta_Covar" in df.columns:
            self.abeta: Dict[str, float] = {
                str(r[id_column]): float(r["Abeta_Covar"])
                for _, r in df.iterrows()
                if not pd.isna(r["Abeta_Covar"])
            }
        else:
            self.abeta = {}

    def quartile(self, sid: str) -> int:
        return self.map.get(str(sid), -1)


class PredictionTable:
    """Per-subject per-ROI tau predictions with uncertainty.

    Formats accepted:
      * JSON: {id: {roi_name: {"loc": m, "std": s}, ...}}
        (`formatted_fold_k_predictions_for_*.json`)
      * JSON: {id: {"Tau_Meta": {"loc": m, "std": s}}} (meta-tau only)
      * .npy pickle of the same dict (NGBoost tables, `data_util.py:340`)
    """

    def __init__(self, source):
        if isinstance(source, dict):
            self.table = source
        elif str(source).endswith(".npy"):
            self.table = np.load(source, allow_pickle=True)
            if isinstance(self.table, np.ndarray):
                self.table = self.table.flat[0]
        else:
            with open(source) as f:
                self.table = json.load(f)
        self.roi_names = [ROI_INDEX_TO_NAME[i] for i in ROI_INDICES]

    def __contains__(self, sid: str) -> bool:
        return str(sid) in self.table

    def merge(self, other: "PredictionTable") -> "PredictionTable":
        merged = dict(other.table)
        merged.update(self.table)
        return PredictionTable(merged)

    def roi_arrays(self, sid: str) -> Tuple[np.ndarray, np.ndarray]:
        """Dense [R] loc/std arrays in ROI_INDICES order (NaN->0), the
        vectorized form of `roi_pred_dicts`
        (`attn_unet_data_parallel.py:641-644`)."""
        r = len(self.roi_names)
        loc = np.zeros((r,), np.float32)
        std = np.zeros((r,), np.float32)
        entry = self.table.get(str(sid))
        if entry:
            for i, name in enumerate(self.roi_names):
                d = entry.get(name)
                if d:
                    loc[i] = np.nan_to_num(float(d.get("loc", 0.0)))
                    std[i] = np.nan_to_num(float(d.get("std", 0.0)))
        return loc, std

    def meta_tau(self, sid: str, key: str = "Tau_Meta", field: str = "loc") -> float:
        """Meta-tau prediction (`VolumeDataset_ADNI_A4_combined.py:79-81`,
        `VolumeDataset.py:674-688`)."""
        entry = self.table.get(str(sid))
        if not entry:
            return float("nan")
        if key in entry:
            v = entry[key]
            return float(v[field]) if isinstance(v, dict) else float(v)
        if "pred" in entry:
            return float(entry["pred"])
        return float("nan")
