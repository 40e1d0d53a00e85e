"""Native (C++) IO runtime vs the pure-NumPy reference implementation."""

import numpy as np
import pytest

from coma_unet_tpu.io.nifti import write_nifti
from coma_unet_tpu.io.volume import load_nifti_vol
from coma_unet_tpu.ops.preprocess import center_pad_crop
from coma_unet_tpu.runtime import (
    load_batch_native,
    load_volume_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native IO library unavailable"
)


@pytest.fixture(scope="module")
def vols(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, spacing in enumerate([(1.0, 1.0, 1.0), (2.0, 2.0, 2.0),
                                 (1.0, 1.5, 2.0)]):
        a = rng.uniform(0, 10, size=(20, 18, 16)).astype(np.float32)
        p = str(root / f"v{i}.nii")
        write_nifti(p, a, spacing=spacing)
        paths.append(p)
        arrays.append((a, spacing))
    # also a gzipped int16 volume with scaling-free path
    a = rng.integers(0, 1000, size=(12, 12, 12)).astype(np.int16)
    p = str(root / "vz.nii.gz")
    write_nifti(p, a, spacing=(2.0, 2.0, 2.0))
    paths.append(p)
    arrays.append((a.astype(np.float32), (2.0, 2.0, 2.0)))
    return paths, arrays


def test_native_matches_numpy_loader(vols):
    paths, _ = vols
    for p in paths:
        want = center_pad_crop(load_nifti_vol(p, resize=True), (16, 16, 16))
        got = load_volume_native(p, target=(16, 16, 16))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_no_resize(vols):
    paths, arrays = vols
    want = center_pad_crop(load_nifti_vol(paths[0], resize=False), (24, 24, 24))
    got = load_volume_native(paths[0], target=(24, 24, 24), resize=False)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_batch(vols):
    paths, _ = vols
    batch = load_batch_native(paths, target=(16, 16, 16), num_threads=2)
    assert batch.shape == (len(paths), 16, 16, 16)
    for i, p in enumerate(paths):
        single = load_volume_native(p, target=(16, 16, 16))
        np.testing.assert_array_equal(batch[i], single[0])


def test_native_missing_file():
    with pytest.raises(IOError):
        load_volume_native("/nonexistent/file.nii", target=(8, 8, 8))
