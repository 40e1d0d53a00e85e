"""Split/fold orchestration — `data_util.py:272-470` rebuilds.

`load_split_datasets` builds the per-fold train/test PredictedMetaTauDatasets
(`data_util.py:291-398`); `load_single_split_datasets` the ADNI-train/A4-test
single split with its 1695/444 size assertion (`:400-416`);
`create_dataloader` routes contrastive datasets through the NaN-abeta-skipping
CustomSampler (`:435-444`); `check_for_longitudinal` flags subjects with
multiple sessions (`:759-778`)."""

from __future__ import annotations

import os
from collections import Counter
from typing import Optional, Sequence, Tuple

from coma_unet_tpu.data.covariates import CovariateTable, PredictionTable, QuartileTable
from coma_unet_tpu.data.datasets import (
    ContrastiveVolumeDataset,
    ClusterVolumeDataset,
    CustomSampler,
    PredictedMetaTauDataset,
)
from coma_unet_tpu.data.lookup import extract_id
from coma_unet_tpu.data.pipeline import DataLoader


def load_split_datasets(
    splits_dir: str,
    fold: int,
    covariate_csv: str,
    quartile_csv: Optional[str] = None,
    meta_tau_source=None,
    mode: str = "cluster",
    holdout_ids: Sequence[str] = (),
    **dataset_kwargs,
) -> Tuple[PredictedMetaTauDataset, PredictedMetaTauDataset]:
    """Per-fold train/test datasets from `training_lookup_k.csv` /
    `test_lookup_k.csv` + the covariate/quartile/meta-tau tables."""
    cov = CovariateTable(covariate_csv)
    quart = QuartileTable(quartile_csv) if quartile_csv else None
    meta = (
        meta_tau_source
        if isinstance(meta_tau_source, (PredictionTable, type(None)))
        else PredictionTable(meta_tau_source)
    )
    mk = lambda csv: PredictedMetaTauDataset(  # noqa: E731
        csv, cov, quart, meta_tau_table=meta, mode=mode, **dataset_kwargs
    )
    train = mk(os.path.join(splits_dir, f"training_lookup_{fold}.csv"))
    test = mk(os.path.join(splits_dir, f"test_lookup_{fold}.csv"))
    return train, test


def load_single_split_datasets(
    train_lookup: str,
    test_lookup: str,
    covariate_csv: str,
    expected_sizes: Optional[Tuple[int, int]] = None,
    **dataset_kwargs,
):
    """ADNI-train / A4-test single split; `expected_sizes=(1695, 444)`
    reproduces the reference's assertion (`data_util.py:413-414`)."""
    cov = CovariateTable(covariate_csv)
    from coma_unet_tpu.data.datasets import CovariateVolumeDataset

    train = CovariateVolumeDataset(train_lookup, cov, **dataset_kwargs)
    test = CovariateVolumeDataset(test_lookup, cov, **dataset_kwargs)
    if expected_sizes is not None:
        assert len(train) == expected_sizes[0], (
            f"train split {len(train)} != {expected_sizes[0]}"
        )
        assert len(test) == expected_sizes[1], (
            f"test split {len(test)} != {expected_sizes[1]}"
        )
    return train, test


def create_dataloader(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    contra: bool = False,
    skip_ids: Sequence[str] = (),
    **loader_kwargs,
) -> DataLoader:
    """Contrastive datasets get the NaN-abeta-skipping CustomSampler."""
    sampler = None
    if contra and isinstance(dataset, (ContrastiveVolumeDataset,
                                       ClusterVolumeDataset)):
        sampler = CustomSampler(dataset, skip_ids=skip_ids, shuffle=shuffle)
        shuffle = False
    return DataLoader(dataset, batch_size, sampler=sampler, shuffle=shuffle,
                      **loader_kwargs)


def check_for_longitudinal(paths: Sequence[str]) -> dict:
    """Subjects with >1 session among `paths` (`data_util.py:759-778`)."""
    subject = Counter(extract_id(p).split("/")[0] for p in paths)
    return {sid: n for sid, n in subject.items() if n > 1}
