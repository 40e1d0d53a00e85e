"""Dataset hierarchy (SURVEY §2.2) — torch-free, host-side.

Mirrors the reference's class tree (`VolumeDataset.py:35-795`,
`VolumeDataset_A4.py`, `VolumeDataset_ADNI_A4_combined.py`,
`VolumeDataset_Inference.py`) with dict samples instead of tuples, numpy
instead of CUDA-resident tensors (the reference builds every sample directly
on the GPU inside `__getitem__`, `VolumeDataset.py:203-204` — here device
transfer happens once per *batch* in the prefetching pipeline), and
deterministic seeded sampling for the contrastive/cluster variants.

Sample schema (numpy):
  mri, tau:  [1, D, H, W] float32
  roi:       [1, D, H, W] float32 (raw FreeSurfer labels)
  abeta:     float
  covars:    [K] float32 ([abeta, age, sex, edu, cog(, meta_tau)])
  tau_path:  str
  (contrastive/cluster items nest 'anchor'/'pos'/'neg'(/'negs') sub-dicts)
"""

from __future__ import annotations

import logging
import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from coma_unet_tpu.data.covariates import CovariateTable, PredictionTable, QuartileTable
from coma_unet_tpu.data.lookup import extract_id, load_lookup_csv
from coma_unet_tpu.io.volume import load_nifti_vol, pad_volume
from coma_unet_tpu.ops.preprocess import center_pad_crop

log = logging.getLogger(__name__)


class VolumeDataset:
    """Base MRI/tau/ROI dataset (`VolumeDataset.py:35-307`)."""

    def __init__(
        self,
        lookup,
        resize: bool = True,
        template_space: bool = False,
        smoothing: bool = False,
        mri_file_type: Optional[str] = None,
        tau_file_type: Optional[str] = None,
        tau_mask_path: Optional[str] = None,
        pad_dims: Optional[Sequence[int]] = None,
        drop_missing_files: bool = True,
        require_columns: Sequence[str] = ("MRI", "tau", "roi"),
    ):
        self.lookup_df = load_lookup_csv(
            lookup, require_columns=require_columns,
            drop_missing_files=drop_missing_files,
        )
        self.resize = resize
        # file-type override switches to template space for w* files
        # (`VolumeDataset.py:111-119`); resolved HERE, not per-item — the
        # threaded DataLoader maps __getitem__ over a pool, and mutating
        # shared state from worker threads is a race.
        if mri_file_type and mri_file_type.startswith("w"):
            template_space = True
        self.template_space = template_space
        self.smoothing = smoothing
        self.mri_file_type = mri_file_type
        self.tau_file_type = tau_file_type
        self.tau_mask_path = tau_mask_path
        # template space pads to 128^3 (resized) or 216^3 (`VolumeDataset.py:123`)
        if pad_dims is None:
            pad_dims = (128, 128, 128) if resize else (216, 216, 216)
        self.pad_dims = tuple(pad_dims)
        self._tau_mask_cache: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.lookup_df)

    # --- path handling -----------------------------------------------------
    def _paths(self, idx: int):
        row = self.lookup_df.iloc[idx]
        mri_path, tau_path, roi_path = row["MRI"], row["tau"], row["roi"]
        # file-type path override (`VolumeDataset.py:111-119`); the w* ->
        # template-space switch happens once in __init__ (thread safety)
        if self.mri_file_type:
            mri_path = os.path.join(os.path.dirname(mri_path), self.mri_file_type)
        if self.tau_file_type:
            tau_path = os.path.join(os.path.dirname(tau_path), self.tau_file_type)
        return mri_path, tau_path, roi_path

    def load_volume_file(self, path: str) -> np.ndarray:
        # native C++ fast path (decode + resample + pad off the GIL), with
        # the pure-NumPy loader as fallback; both are voxel-identical
        try:
            from coma_unet_tpu.runtime import load_volume_native, native_available

            if native_available():
                return load_volume_native(
                    path, target=self.pad_dims, resize=self.resize
                )
        except (IOError, RuntimeError):
            pass
        vol = load_nifti_vol(path, resize=self.resize)
        if vol.shape[-3:] != self.pad_dims:
            vol = center_pad_crop(vol, self.pad_dims)
        return vol

    def _tau_mask(self) -> Optional[np.ndarray]:
        if self.tau_mask_path is None:
            return None
        if self._tau_mask_cache is None:
            self._tau_mask_cache = self.load_volume_file(self.tau_mask_path)
        return self._tau_mask_cache

    def _load_triple(self, idx: int):
        mri_path, tau_path, roi_path = self._paths(idx)
        mri = self.load_volume_file(mri_path)
        tau = self.load_volume_file(tau_path)
        roi = self.load_volume_file(roi_path)
        if self.smoothing:
            tau = _gaussian_smooth_host(tau)
        if not self.template_space:
            # mask MRI by ROI != 0 (`VolumeDataset.py:143-146`)
            mri = mri.copy()
            mri[roi == 0] = 0
        else:
            # template space: mask tau by the MNI tau mask (`:154-157`)
            m = self._tau_mask()
            if m is not None:
                tau = tau.copy()
                tau[m == 0] = 0
        return mri, tau, roi, tau_path

    def __getitem__(self, idx: int) -> Dict:
        mri, tau, roi, tau_path = self._load_triple(idx)
        return {"mri": mri, "tau": tau, "roi": roi, "tau_path": tau_path}


def _gaussian_smooth_host(vol: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """MONAI GaussianSmooth-equivalent host smoothing (erf kernel), applied to
    the tau target when `smoothing=True` (`VolumeDataset.py:138-140`)."""
    from scipy.ndimage import convolve1d

    from coma_unet_tpu.ops.smooth import gaussian_kernel1d

    k = gaussian_kernel1d(sigma)
    out = vol.astype(np.float32)
    for axis in (-3, -2, -1):
        out = convolve1d(out, k, axis=axis, mode="constant")
    return out


class CovariateVolumeDataset(VolumeDataset):
    """+ per-subject covariates and abeta (`VolumeDataset.py:339-433`)."""

    def __init__(
        self,
        lookup,
        covariates: CovariateTable,
        quartiles: Optional[QuartileTable] = None,
        **kwargs,
    ):
        super().__init__(lookup, **kwargs)
        self.covariates = covariates
        self.quartiles = quartiles

    def sample_id(self, idx: int) -> str:
        return extract_id(self.lookup_df.iloc[idx]["tau"])

    def meta_tau(self, idx: int) -> Optional[float]:
        return None

    def __getitem__(self, idx: int) -> Dict:
        item = super().__getitem__(idx)
        sid = self.sample_id(idx)
        abeta, covars = self.covariates.get(sid, meta_tau=self.meta_tau(idx))
        item.update({"abeta": abeta, "covars": covars, "sample_id": sid})
        return item


class ContrastiveVolumeDataset(CovariateVolumeDataset):
    """(anchor, pos, neg) triplets, quartile-matched
    (`VolumeDataset.py:435-511`): positive = random different subject with the
    same abeta status AND tau quartile. The reference draws the negative from
    the same pool too (the `!=` variant is commented at `:470`);
    `true_negatives=True` draws from the complement instead."""

    def __init__(self, lookup, covariates, quartiles, true_negatives=False,
                 seed: int = 0, **kwargs):
        super().__init__(lookup, covariates, quartiles, **kwargs)
        self.true_negatives = true_negatives
        self.rng = random.Random(seed)
        self._index_cells()

    def _index_cells(self):
        self._cell: Dict[tuple, List[int]] = {}
        self._key: List[tuple] = []
        for i in range(len(self.lookup_df)):
            sid = self.sample_id(i)
            abeta, _ = self.covariates.get(sid)
            q = self.quartiles.quartile(sid) if self.quartiles else -1
            key = (int(abeta), int(q))
            self._cell.setdefault(key, []).append(i)
            self._key.append(key)

    def _pick_other(self, idxs: List[int], me: int) -> int:
        pool = [i for i in idxs if i != me]
        return self.rng.choice(pool) if pool else me

    def __getitem__(self, idx: int) -> Dict:
        anchor = super().__getitem__(idx)
        key = self._key[idx]
        pos_idx = self._pick_other(self._cell.get(key, [idx]), idx)
        if self.true_negatives:
            others = [i for k, v in self._cell.items() if k != key for i in v]
            neg_idx = self.rng.choice(others) if others else idx
        else:
            neg_idx = self._pick_other(self._cell.get(key, [idx]), idx)
        pos = CovariateVolumeDataset.__getitem__(self, pos_idx)
        neg = CovariateVolumeDataset.__getitem__(self, neg_idx)
        return {"anchor": anchor, "pos": pos, "neg": neg}


class ClusterVolumeDataset(ContrastiveVolumeDataset):
    """negatives = one sample from every other (abeta, quartile) cell — up to
    7 (`VolumeDataset.py:513-589`)."""

    def __getitem__(self, idx: int) -> Dict:
        anchor = CovariateVolumeDataset.__getitem__(self, idx)
        key = self._key[idx]
        pos_idx = self._pick_other(self._cell.get(key, [idx]), idx)
        pos = CovariateVolumeDataset.__getitem__(self, pos_idx)
        negs = []
        for k, idxs in sorted(self._cell.items()):
            if k == key or not idxs:
                continue
            negs.append(CovariateVolumeDataset.__getitem__(self, self.rng.choice(idxs)))
        return {"anchor": anchor, "pos": pos, "negs": negs}


class RegressionVolumeDataset(ClusterVolumeDataset):
    """Appends meta-tau to the covariates -> covars[6]
    (`VolumeDataset.py:591-664`); mode 'contrastive' | 'cluster'."""

    def __init__(self, lookup, covariates, quartiles, meta_tau_table=None,
                 mode: str = "cluster", meta_tau_noise_std: float = 0.0,
                 noise_seed: int = 0, **kwargs):
        self.meta_tau_table = meta_tau_table
        self.mode = mode
        # noise-injection study apparatus (`data_util.py:306-321`): Gaussian
        # noise on the meta-tau label, deterministic per subject.
        self.meta_tau_noise_std = meta_tau_noise_std
        self.noise_seed = noise_seed
        super().__init__(lookup, covariates, quartiles, **kwargs)

    def meta_tau(self, idx: int) -> Optional[float]:
        sid = self.sample_id(idx)
        if self.meta_tau_table is None:
            return 0.0
        if isinstance(self.meta_tau_table, PredictionTable):
            v = self.meta_tau_table.meta_tau(sid)
        else:
            v = float(self.meta_tau_table.get(sid, float("nan")))
        v = 0.0 if np.isnan(v) else float(v)
        if self.meta_tau_noise_std > 0.0:
            rng = np.random.default_rng(hash((sid, self.noise_seed)) % (2**32))
            v += float(rng.normal(0.0, self.meta_tau_noise_std))
        return v

    def __getitem__(self, idx: int) -> Dict:
        if self.mode == "cluster":
            return ClusterVolumeDataset.__getitem__(self, idx)
        return ContrastiveVolumeDataset.__getitem__(self, idx)


class PredictedMetaTauDataset(RegressionVolumeDataset):
    """Meta-tau from the model-prediction lookup ('pred' / UQ dict) instead of
    ground truth (`VolumeDataset.py:666-795`). Same behavior as
    RegressionVolumeDataset given a PredictionTable — kept as a named class
    for API parity (`data_util.py:340,378-379`)."""


class CombinedVolumeDataset(CovariateVolumeDataset):
    """Flat ADNI+A4 combined dataset (`VolumeDataset_ADNI_A4_combined.py:
    25-133`) — the dataset of the live training driver. Covariates:
    [abeta, age, sex, edu/30, cognition(KNN-predicted MMSCORE), meta_tau
    (predicted loc)]; abeta falls back to the predicted table when NaN."""

    def __init__(
        self,
        lookup,
        covariates: CovariateTable,
        meta_tau_table: Optional[PredictionTable] = None,
        cognition_table: Optional[dict] = None,
        abeta_fallback_table: Optional[dict] = None,
        **kwargs,
    ):
        super().__init__(lookup, covariates, None, **kwargs)
        self.meta_tau_table = meta_tau_table
        self.cognition_table = cognition_table or {}
        self.abeta_fallback_table = abeta_fallback_table or {}

    def __getitem__(self, idx: int) -> Dict:
        item = VolumeDataset.__getitem__(self, idx)
        sid = self.sample_id(idx)
        meta = (
            self.meta_tau_table.meta_tau(sid)
            if self.meta_tau_table is not None
            else 0.0
        )
        meta = 0.0 if (meta is None or np.isnan(meta)) else float(meta)
        abeta, covars = self.covariates.get(sid, meta_tau=meta)
        if abeta == -1.0 and sid in self.abeta_fallback_table:
            abeta = float(self.abeta_fallback_table[sid])
            covars = covars.copy()
            covars[0] = abeta
        if sid in self.cognition_table:
            covars = covars.copy()
            covars[4] = float(self.cognition_table[sid]) / 30.0
        item.update({"abeta": abeta, "covars": covars, "sample_id": sid})
        return item


class A4VolumeDataset(CovariateVolumeDataset):
    """A4 cohort with its own covariate CSV schema (BID/ABETA —
    `VolumeDataset_A4.py:22-115`); schema differences are absorbed by
    CovariateTable's column aliasing."""


class InferenceVolumeDataset(CovariateVolumeDataset):
    """MRI-only inference (`VolumeDataset_Inference.py:57-161`): no tau
    target; the tau slot carries the MRI placeholder; covars are the 6-vector
    with predicted meta-tau/cognition fallbacks."""

    def __init__(self, lookup, covariates, meta_tau_table=None,
                 cognition_table=None, abeta_fallback_table=None, **kwargs):
        kwargs.setdefault("drop_missing_files", True)
        # MRI-only lookups: no tau column (`VolumeDataset_Inference.py:103`)
        kwargs.setdefault("require_columns", ("MRI", "roi"))
        super().__init__(lookup, covariates, None, **kwargs)
        self.meta_tau_table = meta_tau_table
        self.cognition_table = cognition_table or {}
        self.abeta_fallback_table = abeta_fallback_table or {}

    def meta_tau(self, idx: int):
        if self.meta_tau_table is None:
            return 0.0
        v = self.meta_tau_table.meta_tau(self.sample_id(idx))
        return 0.0 if np.isnan(v) else float(v)

    def __getitem__(self, idx: int) -> Dict:
        mri_path, _, roi_path = self._paths(idx)
        mri = self.load_volume_file(mri_path)
        roi = self.load_volume_file(roi_path)
        mri = mri.copy()
        mri[roi == 0] = 0  # mask MRI by ROI (`VolumeDataset_Inference.py:118`)
        sid = self.sample_id(idx)
        abeta, covars = self.covariates.get(sid, meta_tau=self.meta_tau(idx))
        if abeta == -1.0 and sid in self.abeta_fallback_table:
            abeta = float(self.abeta_fallback_table[sid])
            covars = covars.copy()
            covars[0] = abeta
        if sid in self.cognition_table:
            covars = covars.copy()
            covars[4] = float(self.cognition_table[sid]) / 30.0
        return {
            "mri": mri,
            "tau": mri,  # placeholder (`VolumeDataset_Inference.py:145`)
            "roi": roi,
            "abeta": abeta,
            "covars": covars,
            "sample_id": sid,
            "tau_path": mri_path,
        }

    def sample_id(self, idx: int) -> str:
        # cohort-preset lookups carry an explicit SAMPLE_ID column
        # (`VolumeDataset_Inference.py:117`); fall back to path extraction
        row = self.lookup_df.iloc[idx]
        if "SAMPLE_ID" in row:
            return str(row["SAMPLE_ID"])
        return extract_id(row["MRI"])

    def _paths(self, idx: int):
        row = self.lookup_df.iloc[idx]
        roi = row["roi"] if "roi" in row else row["MRI"]
        return row["MRI"], row.get("tau", row["MRI"]), roi


class CustomSampler:
    """Index sampler skipping NaN-abeta subjects and missing files
    (`VolumeDataset.py:310-337`)."""

    def __init__(self, dataset: CovariateVolumeDataset, skip_ids: Sequence[str] = (),
                 shuffle: bool = False, rnd_seed: int = 0):
        skip = set(skip_ids)
        self.indices = []
        for i in range(len(dataset)):
            sid = dataset.sample_id(i)
            if sid in skip:
                continue
            abeta, _ = dataset.covariates.get(sid)
            if np.isnan(abeta):
                continue
            self.indices.append(i)
        if shuffle:
            random.Random(rnd_seed).shuffle(self.indices)

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)
