"""`ImageDataset` reconstruction (SURVEY §2.9; `data_util.py:285-286`,
`validation.py:488-510`): the legacy ROI-SUVR-vector regression pipeline's
dataset — rows of per-ROI SUVR values (+ covariate columns) with a target
vector, supporting column selection and standardization."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd


class ImageDataset:
    """Tabular (ROI-vector) dataset.

    Args:
      source: CSV path or DataFrame; one row per scan.
      col_list: feature columns (settable later via `set_col_list`).
      target_cols: target columns (default: same as the features; the
        reference's pipeline regresses tau ROI means).
    """

    def __init__(
        self,
        source,
        col_list: Optional[Sequence[str]] = None,
        target_cols: Optional[Sequence[str]] = None,
        transform=None,
    ):
        self.df = source if isinstance(source, pd.DataFrame) else pd.read_csv(source)
        self.col_list = list(col_list) if col_list else [
            c for c in self.df.columns if self.df[c].dtype != object
        ]
        self.target_cols = list(target_cols) if target_cols else self.col_list
        self.transform = transform
        self._mean: Optional[np.ndarray] = None
        self._std: Optional[np.ndarray] = None

    def set_col_list(self, col_list: Sequence[str]) -> None:
        self.col_list = list(col_list)
        self._mean = self._std = None  # stats no longer match the columns

    def set_mean_std(self, mean, std) -> None:
        self._mean = np.asarray(mean, np.float32)
        self._std = np.asarray(std, np.float32)

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        x = self.df.iloc[idx][self.col_list].to_numpy(np.float32)
        if self._mean is not None:
            x = (x - self._mean) / np.where(self._std == 0, 1.0, self._std)
        y = self.df.iloc[idx][self.target_cols].to_numpy(np.float32)
        if self.transform:
            x = self.transform(x)
        return x, y

    def get_targets(self) -> np.ndarray:
        return self.df[self.target_cols].to_numpy(np.float32)

    def get_mris(self) -> np.ndarray:
        return self.df[self.col_list].to_numpy(np.float32)
