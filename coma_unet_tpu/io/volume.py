"""Volume loading + preprocessing (SURVEY §2.1).

Host-side pipeline replicating the reference semantics:
  * `read_image_with_retry` — N retries with backoff for flaky network
    filesystems (`data_util.py:80-96`).
  * `load_nifti_vol` — read -> resample to 2 mm iso (nearest-neighbor,
    `VolumeDataset.py:240-264`) -> float32, NaN->0, channel dim
    (`data_util.py:125-164`).
  * `write_tensor_to_nii` — tensor -> NIfTI (`data_util.py:512-517`).
  * `load_template` / masking helpers (`data_util.py:830-839`,
    `VolumeDataset.py:74-83,143-157`).

Arrays are (z, y, x) like the reference's `GetArrayFromImage` tensors; the
channel dim is prepended so shapes are [1, D, H, W] (NCDHW sans batch).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from coma_unet_tpu.io.nifti import NiftiImage, read_nifti, write_nifti
from coma_unet_tpu.ops.preprocess import center_pad_crop
from coma_unet_tpu.ops.resize import resize_nearest, resize_linear

log = logging.getLogger(__name__)


def read_image_with_retry(
    path: str, max_retries: int = 10, retry_delay: float = 10.0
) -> NiftiImage:
    """`data_util.read_image_with_retry` (`data_util.py:80-96`)."""
    err: Optional[Exception] = None
    for attempt in range(max_retries):
        try:
            return read_nifti(path)
        except (OSError, ValueError) as e:
            err = e
            if attempt < max_retries - 1:
                log.warning("read %s failed (%s); retry %d/%d", path, e,
                            attempt + 1, max_retries)
                time.sleep(retry_delay)
    raise IOError(f"failed to read {path} after {max_retries} retries") from err


def load_nifti_vol(
    path: str,
    resize: bool = True,
    new_spacing: Sequence[float] = (2.0, 2.0, 2.0),
    interpolation: str = "nearest",
    max_retries: int = 10,
    retry_delay: float = 10.0,
) -> np.ndarray:
    """Read a NIfTI and return a [1, D, H, W] float32 (z,y,x) array resampled
    to `new_spacing`, NaN->0 (`data_util.py:125-164`)."""
    img = read_image_with_retry(path, max_retries, retry_delay)
    vol = img.data_zyx.astype(np.float32)
    if resize:
        spacing_zyx = img.spacing_zyx
        if interpolation == "nearest":
            vol = resize_nearest(vol, spacing_zyx, new_spacing[::-1])
        else:
            vol = resize_linear(vol, spacing_zyx, new_spacing[::-1])
    vol = np.nan_to_num(vol, copy=False)
    return vol[None]


def write_tensor_to_nii(
    tensor, path: str, spacing: Tuple[float, float, float] = (2.0, 2.0, 2.0)
) -> None:
    """[1, D, H, W] or [D, H, W] (z,y,x) array -> .nii
    (`data_util.py:512-517`)."""
    arr = np.asarray(tensor)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 5:
        arr = arr[0, 0]
    write_nifti(path, np.transpose(arr, (2, 1, 0)), spacing=spacing)


def pad_volume(target: Sequence[int] = (128, 128, 128)) -> Callable:
    """Closure mirroring `data_util.pad_volume` (`data_util.py:814-828`):
    center pad/crop the trailing 3 dims to `target`."""
    tgt = tuple(target)

    def _apply(vol: np.ndarray) -> np.ndarray:
        return center_pad_crop(vol, tgt)

    return _apply


def mask_volume(vol: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Zero `vol` where `mask` == 0 (`VolumeDataset.py:143-157`)."""
    out = vol.copy()
    out[mask == 0] = 0
    return out


def load_template(
    path: str, target: Sequence[int] = (128, 128, 128), resize: bool = True
) -> np.ndarray:
    """Load a template-space ROI mask resized/padded to `target`
    (`data_util.py:830-839`). Returns [D, H, W]."""
    vol = load_nifti_vol(path, resize=resize)
    return center_pad_crop(vol[0], tuple(target))


def reduce_image_size(vol: np.ndarray) -> np.ndarray:
    """Crop to the nonzero bounding box (`data_util.reduce_image_size`,
    `data_util.py:67-78`). Works on [..., D, H, W]."""
    arr = np.asarray(vol)
    spatial = arr.reshape((-1,) + arr.shape[-3:]).any(axis=0)
    if not spatial.any():
        return arr
    idx = np.nonzero(spatial)
    sl = tuple(slice(int(i.min()), int(i.max()) + 1) for i in idx)
    return arr[(Ellipsis,) + sl]


def convert_npy_to_nii(npy_path: str, nii_path: str,
                       spacing=(2.0, 2.0, 2.0)) -> None:
    """`data_util.convert_npy_to_nii` (`data_util.py:781-794`)."""
    write_tensor_to_nii(np.load(npy_path), nii_path, spacing=spacing)
