"""NIfTI reader/writer round-trip and format handling."""

import numpy as np
import pytest

from multimodal_ad_tpu.utils import nifti


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_roundtrip(tmp_path, ext, dtype, rng):
    shape = (11, 13, 9)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, 100, shape).astype(dtype)
    else:
        data = rng.normal(size=shape).astype(dtype)
    path = str(tmp_path / ("vol" + ext))
    nifti.save(path, data, pixdim=(2.0, 2.0, 2.0))
    out = nifti.load(path)
    assert out.shape == shape
    np.testing.assert_allclose(out, data.astype(np.float32), rtol=1e-6)


def test_header_fields(tmp_path, rng):
    data = rng.normal(size=(5, 6, 7)).astype(np.float32)
    path = str(tmp_path / "v.nii")
    nifti.save(path, data, pixdim=(2.0, 2.0, 2.0))
    hdr = nifti.read_header(path)
    assert hdr.shape == (5, 6, 7)
    assert hdr.pixdim == (2.0, 2.0, 2.0)
    assert hdr.vox_offset == 352
    assert hdr.affine[0, 0] == 2.0


def test_scl_slope_applied(tmp_path):
    import struct
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    path = str(tmp_path / "s.nii")
    nifti.save(path, data)
    # patch scl_slope/inter in the header
    raw = bytearray(open(path, "rb").read())
    struct.pack_into("<2f", raw, 112, 2.0, 1.0)
    open(path, "wb").write(bytes(raw))
    out = nifti.load(path)
    np.testing.assert_allclose(out, data.astype(np.float32) * 2.0 + 1.0)


def test_fortran_order_matches_xyz_indexing(tmp_path):
    """NIfTI data block is Fortran-ordered; loaded array must index [x,y,z]."""
    data = np.zeros((3, 4, 5), np.float32)
    data[2, 0, 0] = 7.0
    data[0, 3, 0] = 8.0
    data[0, 0, 4] = 9.0
    path = str(tmp_path / "f.nii")
    nifti.save(path, data)
    out = nifti.load(path)
    assert out[2, 0, 0] == 7.0
    assert out[0, 3, 0] == 8.0
    assert out[0, 0, 4] == 9.0


def test_exists_with_ext(tmp_path, rng):
    data = rng.normal(size=(3, 3, 3)).astype(np.float32)
    gz = str(tmp_path / "x.nii.gz")
    nifti.save(gz, data)
    assert nifti.exists_with_ext(str(tmp_path / "x.nii")) == gz
    assert nifti.exists_with_ext(str(tmp_path / "y.nii")) is None
