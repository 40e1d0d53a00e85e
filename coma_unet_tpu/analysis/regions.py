"""Region/sample analysis utilities — rebuilds of `data_util.analyze_region`
/ `analyze_sample` (`data_util.py:503-700`) and `create_roi_suvr_csv`
(imported at `attn_unet_data_parallel.py:29`): per-ROI SUVR statistics tables
and per-sample region summaries from (volume, roi-mask) pairs."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from coma_unet_tpu.config import ROI_INDEX_TO_NAME, ROI_INDICES


def analyze_region(
    volume: np.ndarray, roi: np.ndarray, roi_index: int
) -> Dict[str, float]:
    """Stats of `volume` within one ROI: mean/std/min/max/voxels."""
    mask = roi == roi_index
    vals = np.asarray(volume)[mask]
    if vals.size == 0:
        return {"mean": float("nan"), "std": float("nan"),
                "min": float("nan"), "max": float("nan"), "voxels": 0}
    return {
        "mean": float(vals.mean()), "std": float(vals.std()),
        "min": float(vals.min()), "max": float(vals.max()),
        "voxels": int(vals.size),
    }


def analyze_sample(
    volume: np.ndarray,
    roi: np.ndarray,
    roi_indices: Sequence[int] = ROI_INDICES,
) -> pd.DataFrame:
    """Per-ROI stats table for one sample."""
    rows = []
    for idx in roi_indices:
        row = analyze_region(volume, roi, idx)
        row["roi_index"] = idx
        row["roi_name"] = ROI_INDEX_TO_NAME.get(idx, str(idx))
        rows.append(row)
    return pd.DataFrame(rows)


def create_roi_suvr_table(
    samples: Sequence[Dict],
    roi_indices: Sequence[int] = ROI_INDICES,
    volume_key: str = "tau",
    out_csv: Optional[str] = None,
) -> pd.DataFrame:
    """Build the `roi_info_suvr.csv`-style table (`data_util.py:925`): one
    row per sample, one column per ROI mean SUVR."""
    cols = {ROI_INDEX_TO_NAME.get(i, str(i)): [] for i in roi_indices}
    ids = []
    for s in samples:
        vol = np.asarray(s[volume_key]).squeeze()
        roi = np.asarray(s["roi"]).squeeze()
        ids.append(s.get("sample_id", ""))
        for i in roi_indices:
            mask = roi == i
            cols[ROI_INDEX_TO_NAME.get(i, str(i))].append(
                float(vol[mask].mean()) if mask.any() else float("nan")
            )
    df = pd.DataFrame(cols, index=ids)
    if out_csv:
        df.to_csv(out_csv)
    return df
