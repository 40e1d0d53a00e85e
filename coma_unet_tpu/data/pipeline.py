"""Batching + prefetching pipeline.

The reference's DataLoader loads every volume synchronously inside
`__getitem__` and puts each sample on the GPU one at a time
(`VolumeDataset.py:203-204` — disk -> host -> device per volume, no workers).
Here: a thread pool loads samples concurrently (NIfTI decode + resample are
NumPy and release the GIL in the hot loops), whole batches are collated on
host, and a double-buffered prefetcher overlaps the next batch's IO with the
current step's device compute — `jax.device_put` of one contiguous batch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np

from coma_unet_tpu.config import ROI_INDICES
from coma_unet_tpu.data.covariates import PredictionTable
from coma_unet_tpu.ops.roi import make_roi_lut

_LUT_CACHE: Dict[tuple, np.ndarray] = {}


def _roi_lut_np(roi_indices=ROI_INDICES) -> np.ndarray:
    key = tuple(roi_indices)
    if key not in _LUT_CACHE:
        _LUT_CACHE[key] = np.asarray(make_roi_lut(roi_indices))
    return _LUT_CACHE[key]


def compact_roi_np(roi: np.ndarray, roi_indices=ROI_INDICES) -> np.ndarray:
    lut = _roi_lut_np(roi_indices)
    idx = np.clip(roi.astype(np.int64), 0, lut.shape[0] - 1)
    return lut[idx].astype(np.int32)


def _stack_flat(samples: List[Dict], predictions: Optional[PredictionTable],
                prefix: str = "", roi_indices=ROI_INDICES) -> Dict[str, np.ndarray]:
    mri = np.stack([s["mri"] for s in samples]).astype(np.float32)
    out = {prefix + "mri": mri}
    if "tau" in samples[0]:
        out[prefix + "tau"] = np.stack([s["tau"] for s in samples]).astype(np.float32)
    roi = np.stack([s["roi"][0] for s in samples])
    out[prefix + "roi_compact"] = compact_roi_np(roi, roi_indices)
    if "covars" in samples[0]:
        covars = np.stack([np.asarray(s["covars"], np.float32).reshape(-1)
                           for s in samples])
        out[prefix + "covars"] = covars
        out[prefix + "abeta"] = np.asarray(
            [s.get("abeta", -1.0) for s in samples], np.float32
        )
    r = len(roi_indices)
    locs = np.zeros((len(samples), r), np.float32)
    stds = np.zeros((len(samples), r), np.float32)
    if predictions is not None:
        for i, s in enumerate(samples):
            sid = s.get("sample_id")
            if sid is not None and sid in predictions:
                locs[i], stds[i] = predictions.roi_arrays(sid)
    out[prefix + "roi_loc"] = locs
    out[prefix + "roi_std"] = stds
    return out


def collate(
    samples: List[Dict],
    predictions: Optional[PredictionTable] = None,
    with_triplets: bool = False,
    roi_indices=ROI_INDICES,
) -> Dict[str, np.ndarray]:
    """Samples -> train-step batch dict (SURVEY §3.3 batch-schema cleanup:
    one coherent schema for flat and triplet batches).

    Flat samples produce {mri, tau, roi_compact, covars, abeta, roi_loc,
    roi_std, sample_ids}; triplet/cluster samples additionally produce
    pos_*/neg_* mirrors when `with_triplets` (the tCDS path); the RnC live
    path needs only anchors.
    """
    nested = "anchor" in samples[0]
    anchors = [s["anchor"] if nested else s for s in samples]
    batch = _stack_flat(anchors, predictions, roi_indices=roi_indices)
    batch["sample_ids"] = [s.get("sample_id", "") for s in anchors]
    batch["tau_paths"] = [s.get("tau_path", "") for s in anchors]
    if nested and with_triplets:
        pos = [s["pos"] for s in samples]
        batch.update(_stack_flat(pos, predictions, prefix="pos_",
                                 roi_indices=roi_indices))
        negs = [
            (s.get("neg") or (s["negs"][0] if s.get("negs") else s["pos"]))
            for s in samples
        ]
        batch.update(_stack_flat(negs, predictions, prefix="neg_",
                                 roi_indices=roi_indices))
    return batch


class DataLoader:
    """Threaded, double-buffered batch loader.

    Args:
      dataset: indexable dataset returning sample dicts.
      batch_size: samples per batch (last partial batch dropped when
        `drop_last`, else padded by wrapping).
      sampler: iterable of indices (e.g. `CustomSampler`); default range.
      predictions: PredictionTable for roi_loc/roi_std painting inputs.
      num_workers: loader threads.
      prefetch: batches to stage ahead.
      device_put: optional fn applied to each collated batch (e.g. sharding).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[Iterable[int]] = None,
        predictions: Optional[PredictionTable] = None,
        with_triplets: bool = False,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = False,
        device_put: Optional[Callable] = None,
        roi_indices=ROI_INDICES,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.predictions = predictions
        self.with_triplets = with_triplets
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.device_put = device_put
        self.roi_indices = roi_indices
        self._epoch = 0

    def _indices(self) -> List[int]:
        idxs = list(self.sampler) if self.sampler is not None else list(
            range(len(self.dataset))
        )
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            idxs = [idxs[i] for i in rng.permutation(len(idxs))]
        return idxs

    def __len__(self) -> int:
        n = len(list(self.sampler)) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idxs = self._indices()
        self._epoch += 1
        batches = [
            idxs[i : i + self.batch_size]
            for i in range(0, len(idxs), self.batch_size)
        ]
        if not batches:
            return
        if self.drop_last and len(batches[-1]) < self.batch_size:
            batches.pop()
        valid_counts = [len(b) for b in batches]
        if (not self.drop_last and len(batches[-1]) < self.batch_size
                and len(idxs) >= self.batch_size):
            # wrap-pad so compiled step shapes stay static; the padded rows
            # are flagged invalid so eval never double-counts them (the
            # reference evaluates each sample exactly once).
            need = self.batch_size - len(batches[-1])
            batches[-1] = batches[-1] + idxs[:need]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b, n_valid in zip(batches, valid_counts):
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, b))
                    batch = collate(samples, self.predictions,
                                    self.with_triplets, self.roi_indices)
                    batch["valid"] = np.arange(len(b)) < n_valid
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                    out_q.put(batch)
            out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
