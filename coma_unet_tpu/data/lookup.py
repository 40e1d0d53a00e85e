"""Lookup-CSV and subject-id bookkeeping (SURVEY §2.3).

The split lookup CSVs have `MRI`, `tau`, `roi` path columns
(`VolumeDataset.py:107-109`); subject ids are parsed out of xnat-style paths
(`data_util.py:716-754`); a hardcoded faulty-sample denylist and holdout list
filter samples (`data_util.py:39-65,701-714`).
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence

import pandas as pd

# Faulty ADNI samples removed by `data_util.remove_invalid`
# (`data_util.py:51-65`). Extend via config.
INVALID_IDS: tuple = ()


def extract_id(path: str) -> str:
    """Subject id from an xnat-style path (`data_util.py:716-745`).

    Handles layouts: .../a4/<BID>/..., .../scan/<id>/<session>/...,
    .../adni/<PTID>/<session>/..., .../ucsf/<id>/..., .../processed/<id>/...,
    .../outputs/<id>/... Falls back to the 4th-from-last component.
    """
    tokens = [t for t in path.split("/") if t]
    for marker in ("a4", "ucsf", "processed", "outputs"):
        if marker in tokens:
            i = tokens.index(marker)
            if i + 1 < len(tokens):
                return tokens[i + 1]
    if "scan" in tokens:
        i = tokens.index("scan")
        return "/".join(tokens[i + 1 : i + 3])
    if "adni" in tokens:
        i = tokens.index("adni")
        return "/".join(tokens[i + 1 : i + 3])
    # fallback: `CustomSampler.get_id_from_path` (`VolumeDataset.py:330-337`)
    return get_id_from_path(path)


def get_id_from_path(path: str) -> str:
    """`VolumeDataset.CustomSampler.get_id_from_path`: 4th-from-last chunk,
    joined with the session dir when it looks like an ADNI PTID."""
    chunks = [t for t in path.split("/") if t]
    if len(chunks) < 4:
        return chunks[0] if chunks else path
    id_chunk = chunks[-4]
    if "-" in id_chunk:
        return os.path.join(id_chunk, chunks[-3])
    return id_chunk


def load_lookup_csv(
    path_or_df,
    require_columns: Sequence[str] = ("MRI", "tau", "roi"),
    drop_missing_files: bool = True,
) -> pd.DataFrame:
    """Read a split lookup CSV, dropping rows whose MRI file is missing
    (`VolumeDataset.py:85-98`)."""
    df = path_or_df if isinstance(path_or_df, pd.DataFrame) else pd.read_csv(path_or_df)
    for c in require_columns:
        if c not in df.columns:
            raise ValueError(f"lookup table missing column {c!r}")
    if drop_missing_files:
        keep = df["MRI"].map(os.path.isfile)
        df = df[keep]
    return df.reset_index(drop=True)


def filter_for_holdout(ids: Iterable[str], holdout_ids: Sequence[str]) -> List[bool]:
    """Boolean keep-mask excluding holdout subjects.

    The reference's `filter_for_holdout` (`data_util.py:701-714`) intends this
    but its mask assignment is broken (`holdout_mask = torch.ones(...)[idxs] =
    False` rebinds the name); we implement the intended behavior.
    """
    hs = set(holdout_ids)
    return [i not in hs for i in ids]


def remove_invalid(ids: Iterable[str], invalid: Sequence[str] = INVALID_IDS) -> List[str]:
    """Drop denylisted faulty samples (`data_util.py:51-65`)."""
    bad = set(invalid)
    return [i for i in ids if i not in bad]


def create_splits_lookup_tables(
    all_df: pd.DataFrame,
    fold_ids: Sequence[Sequence[str]],
    out_dir: str,
    id_column: str = "tau",
) -> None:
    """Per-fold train/test lookup CSVs from id lists
    (`data_util.py:419-432`)."""
    os.makedirs(out_dir, exist_ok=True)
    ids = all_df[id_column].map(extract_id)
    for k, test_ids in enumerate(fold_ids):
        test_mask = ids.isin(set(test_ids))
        all_df[test_mask].to_csv(
            os.path.join(out_dir, f"test_lookup_{k + 1}.csv"), index=False
        )
        all_df[~test_mask].to_csv(
            os.path.join(out_dir, f"training_lookup_{k + 1}.csv"), index=False
        )
