"""NIfTI I/O + preprocessing tests with synthetic volumes."""

import numpy as np
import pytest

from coma_unet_tpu.io.nifti import read_nifti, write_nifti
from coma_unet_tpu.io.volume import load_nifti_vol, pad_volume, write_tensor_to_nii
from coma_unet_tpu.ops.preprocess import center_pad_crop
from coma_unet_tpu.ops.resize import output_size, resize_nearest


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(7, 9, 11)).astype(np.float32)
    p = str(tmp_path / "vol.nii")
    write_nifti(p, data, spacing=(1.5, 2.0, 2.5))
    img = read_nifti(p)
    np.testing.assert_array_equal(img.data, data)
    assert img.spacing == (1.5, 2.0, 2.5)


def test_nifti_gzip_roundtrip(tmp_path):
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "vol.nii.gz")
    write_nifti(p, data)
    img = read_nifti(p)
    np.testing.assert_array_equal(img.data, data)


def test_nifti_zyx_view(tmp_path):
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)  # (x=2, y=3, z=4)
    p = str(tmp_path / "v.nii")
    write_nifti(p, data)
    img = read_nifti(p)
    assert img.data_zyx.shape == (4, 3, 2)
    assert img.data_zyx[1, 2, 0] == data[0, 2, 1]


def test_load_nifti_vol_resamples_to_2mm(tmp_path):
    # 1 mm iso 20^3 -> 2 mm iso 10^3
    data = np.random.default_rng(1).uniform(size=(20, 20, 20)).astype(np.float32)
    p = str(tmp_path / "t.nii")
    write_nifti(p, data, spacing=(1.0, 1.0, 1.0))
    vol = load_nifti_vol(p)
    assert vol.shape == (1, 10, 10, 10)
    # NN with ratio 2: out[i] = in[round(2i)] = in[2i]
    np.testing.assert_array_equal(
        vol[0], np.transpose(data, (2, 1, 0))[::2, ::2, ::2]
    )


def test_resize_output_size_matches_reference_rounding():
    # `VolumeDataset.py:245-249`: int(np.round(size * spacing / new))
    assert output_size((91, 109, 91), (2.0, 2.0, 2.0), (2.0,) * 3) == (91, 109, 91)
    assert output_size((256, 256, 166), (1.0, 1.0, 1.2), (2.0,) * 3) == (128, 128, 100)


def test_resize_nearest_halfup_rounding():
    vol = np.arange(5, dtype=np.float32).reshape(5, 1, 1)
    # spacing 1 -> 1.5: out size round(5/1.5)=3, idx = floor(i*1.5+0.5) = 0,2,3
    out = resize_nearest(vol, (1.0, 1.0, 1.0), (1.5, 1.0, 1.0))
    np.testing.assert_array_equal(out[:, 0, 0], [0, 2, 3])


def test_center_pad_crop():
    v = np.ones((1, 5, 8, 3))
    out = center_pad_crop(v, (6, 6, 6))
    assert out.shape == (1, 6, 6, 6)
    # dim1 padded 5->6 (lo 0, hi 1); dim2 cropped 8->6; dim3 padded 3->6 (lo 1)
    assert out[0, -1].sum() == 0          # padded plane on dim1 high side
    assert out[0, :, :, 0].sum() == 0     # padded plane on dim3 low side
    assert out[0, 0, 0, 1] == 1.0         # original content present
    assert out.sum() == 5 * 6 * 3         # all original ones survive, pad is 0


def test_pad_volume_closure():
    fn = pad_volume((4, 4, 4))
    out = fn(np.ones((1, 2, 6, 4)))
    assert out.shape == (1, 4, 4, 4)


def test_write_tensor_roundtrip(tmp_path):
    vol = np.random.default_rng(2).uniform(size=(1, 4, 5, 6)).astype(np.float32)
    p = str(tmp_path / "out.nii")
    write_tensor_to_nii(vol, p)
    back = load_nifti_vol(p, resize=False)
    np.testing.assert_allclose(back, vol, rtol=1e-6)
