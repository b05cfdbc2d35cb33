"""IO codec tests: NRRD/NIfTI round-trips and geometry conventions."""

import numpy as np

from cmrtpu.io import MedicalImage, read_image, write_image
from cmrtpu.io.geometry import copy_meta


def test_nrrd_roundtrip_3d(tmp_path, rng):
    arr = rng.normal(size=(7, 32, 28)).astype(np.float32)  # z,y,x
    img = MedicalImage(array=arr, spacing=(1.3, 1.4, 8.0), origin=(1.0, -2.0, 3.0),
                       metadata={"patient": "patient001"})
    path = str(tmp_path / "vol.nrrd")
    write_image(img, path)
    back = read_image(path)
    np.testing.assert_allclose(back.array, arr, rtol=1e-6)
    np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-6)
    np.testing.assert_allclose(back.origin, img.origin, rtol=1e-6)
    assert back.metadata.get("patient") == "patient001"
    assert back.size == (28, 32, 7)  # x,y,z (sitk GetSize parity)


def test_nrrd_roundtrip_2d_uint8(tmp_path):
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    img = MedicalImage(array=arr, spacing=(1.2, 1.2))
    path = str(tmp_path / "slice_msk.nrrd")
    write_image(img, path)
    back = read_image(path)
    np.testing.assert_array_equal(back.array, arr)
    assert back.array.dtype == np.uint8


def test_nrrd_direction_roundtrip(tmp_path, rng):
    direction = (0.0, 1.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    img = MedicalImage(array=rng.normal(size=(2, 4, 4)).astype(np.float32),
                       spacing=(2.0, 3.0, 4.0), direction=direction)
    path = str(tmp_path / "dir.nrrd")
    write_image(img, path)
    back = read_image(path)
    np.testing.assert_allclose(back.direction_matrix, img.direction_matrix, atol=1e-6)
    np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-6)


def test_nifti_roundtrip(tmp_path, rng):
    arr = rng.normal(200.0, 50.0, size=(10, 40, 36)).astype(np.float32)
    img = MedicalImage(array=arr, spacing=(1.37, 1.37, 10.0), origin=(-3.0, 5.5, 0.0))
    for name in ("vol.nii", "vol.nii.gz"):
        path = str(tmp_path / name)
        write_image(img, path)
        back = read_image(path)
        np.testing.assert_allclose(back.array, arr, rtol=1e-6)
        np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-5)
        np.testing.assert_allclose(back.origin, img.origin, atol=1e-4)


def test_nifti_4d_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(5, 4, 16, 16)).astype(np.float32)  # t,z,y,x
    img = MedicalImage(array=arr, spacing=(1.5, 1.5, 8.0, 1.0))
    path = str(tmp_path / "cine4d.nii.gz")
    write_image(img, path)
    back = read_image(path)
    assert back.array.shape == (5, 4, 16, 16)
    np.testing.assert_allclose(back.array, arr, rtol=1e-6)


def test_copy_meta_4d_to_2d():
    ref = MedicalImage(array=np.zeros((3, 4, 8, 8)), spacing=(1.2, 1.3, 8.0, 1.0),
                       origin=(1.0, 2.0, 3.0, 0.0), metadata={"k": "v"})
    sliced = copy_meta(MedicalImage(array=np.zeros((8, 8))), ref)
    assert sliced.spacing == (1.2, 1.3)
    assert sliced.origin == (1.0, 2.0)
    assert sliced.metadata == {"k": "v"}


def test_inplane_spacing_property():
    img = MedicalImage(array=np.zeros((4, 8, 8)), spacing=(1.25, 1.25, 8.0))
    assert img.inplane_spacing == 1.25
