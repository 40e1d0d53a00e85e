"""ctypes bindings for the C++ IO runtime (`nifti_native.cc`).

Builds the shared library on first use (g++ -O3, cached next to the source);
falls back to the pure-NumPy path in `coma_unet_tpu.io` when the toolchain is
unavailable. The batch loader decodes + resamples + pads a whole batch of
NIfTI volumes on a C++ thread pool, outside the GIL.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "nifti_native.cc")
_LIB = os.path.join(_HERE, "_nifti_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB, "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except (subprocess.CalledProcessError, OSError, subprocess.TimeoutExpired) as e:
        err = getattr(e, "stderr", b"")
        log.warning("native IO build failed: %s %s", e, err[:500] if err else "")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            log.warning("native IO load failed: %s", e)
            return None
        lib.cn_load_volume.restype = ctypes.c_int
        lib.cn_load_volume.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ]
        lib.cn_load_batch.restype = ctypes.c_int
        lib.cn_load_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def load_volume_native(
    path: str,
    target: Sequence[int] = (128, 128, 128),
    new_spacing: float = 2.0,
    resize: bool = True,
    linear: bool = False,
) -> np.ndarray:
    """Load one NIfTI -> [1, D, H, W] float32 (z,y,x), resampled + padded.
    Raises RuntimeError when the native library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    tz, ty, tx = target
    out = np.empty((tz, ty, tx), np.float32)
    rc = lib.cn_load_volume(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tz, ty, tx, ctypes.c_float(new_spacing), int(resize), int(linear),
    )
    if rc != 0:
        raise IOError(f"native NIfTI load failed for {path}")
    return out[None]


def load_batch_native(
    paths: Sequence[str],
    target: Sequence[int] = (128, 128, 128),
    new_spacing: float = 2.0,
    resize: bool = True,
    linear: bool = False,
    num_threads: int = 0,
) -> np.ndarray:
    """Load a batch -> [N, D, H, W] float32 with a C++ thread pool."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    tz, ty, tx = target
    n = len(paths)
    out = np.empty((n, tz, ty, tx), np.float32)
    packed = b"\x00".join(p.encode() for p in paths) + b"\x00"
    failures = lib.cn_load_batch(
        packed, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tz, ty, tx, ctypes.c_float(new_spacing), int(resize), int(linear),
        num_threads,
    )
    if failures:
        raise IOError(f"native batch load: {failures}/{n} volumes failed")
    return out
