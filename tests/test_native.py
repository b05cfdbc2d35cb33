"""Native cmrio library: build, roundtrips, fallback equivalence."""

import gzip
import os
import zlib

import numpy as np
import pytest

from cmrtpu.native import cmrio
from cmrtpu.native.build import native_available


def _payloads():
    rng = np.random.default_rng(0)
    return [
        b"",
        b"hello world" * 100,
        rng.integers(0, 255, size=100_000, dtype=np.uint8).tobytes(),
        np.zeros(1 << 20, np.uint8).tobytes(),
    ]


def test_native_library_builds():
    # The baked toolchain must produce a working library in this image.
    assert native_available(), "libcmrio failed to build/load"


@pytest.mark.parametrize("idx", range(4))
def test_inflate_roundtrip_gzip_and_zlib(idx):
    data = _payloads()[idx]
    assert cmrio.inflate(gzip.compress(data)) == data
    assert cmrio.inflate(zlib.compress(data)) == data


def test_deflate_gzip_is_standard_container():
    data = b"ACDC SAX slice payload " * 1000
    blob = cmrio.deflate_gzip(data, level=1)
    assert gzip.decompress(blob) == data


def test_deflate_incompressible_payload():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 255, size=50_000, dtype=np.uint8).tobytes()
    assert gzip.decompress(cmrio.deflate_gzip(data)) == data


def test_multimember_gzip_concatenation():
    # NRRD writers may emit concatenated gzip members.
    a, b = b"first-member" * 50, b"second-member" * 50
    blob = gzip.compress(a) + gzip.compress(b)
    assert cmrio.inflate(blob) == a + b


def test_read_file_bytes(tmp_path):
    path = tmp_path / "blob.bin"
    payload = os.urandom(10_000)
    path.write_bytes(payload)
    assert cmrio.read_file_bytes(str(path)) == payload


def test_inflate_batch_parallel():
    rng = np.random.default_rng(2)
    datas = [rng.integers(0, 255, size=rng.integers(10, 200_000),
                          dtype=np.uint8).tobytes() for _ in range(17)]
    blobs = [gzip.compress(d) for d in datas]
    out = cmrio.inflate_batch(blobs, n_threads=4)
    assert out == datas


def test_inflate_into_numpy_buffer():
    data = np.arange(4096, dtype=np.float32)
    blob = gzip.compress(data.tobytes())
    out = np.empty(4096, np.float32)
    n = cmrio.inflate_into(blob, out)
    assert n == data.nbytes
    np.testing.assert_array_equal(out, data)


def test_python_fallback_matches_native(monkeypatch):
    data = b"fallback equivalence " * 500
    blob = gzip.compress(data)
    native = cmrio.inflate(blob)
    monkeypatch.setattr("cmrtpu.native.cmrio.get_library", lambda: None)
    assert cmrio.inflate(blob) == native == data
    assert gzip.decompress(cmrio.deflate_gzip(data)) == data


def test_nrrd_roundtrip_uses_native(tmp_path):
    from cmrtpu.io import MedicalImage, read_image, write_image
    arr = np.random.default_rng(3).normal(size=(12, 48, 48)).astype(np.float32)
    img = MedicalImage(array=arr, spacing=(1.5, 1.2, 1.2))
    path = str(tmp_path / "vol_img.nrrd")
    write_image(img, path)
    back = read_image(path)
    np.testing.assert_allclose(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing)


def test_python_fallback_multimember(monkeypatch):
    """Fallback must decode ALL gzip members, like the native path."""
    a, b = b"A" * 100, b"B" * 100
    blob = gzip.compress(a) + gzip.compress(b)
    monkeypatch.setattr("cmrtpu.native.cmrio.get_library", lambda: None)
    assert cmrio.inflate(blob) == a + b
    assert cmrio.inflate_batch([blob]) == [a + b]


def test_isize_hint_sizes_high_ratio_payloads():
    from cmrtpu.native.cmrio import gzip_isize_hint
    data = bytes(5 << 20)  # 5 MiB of zeros compresses ~1000x
    blob = gzip.compress(data)
    assert gzip_isize_hint(blob) == len(data)
    assert cmrio.inflate(blob) == data
    assert gzip_isize_hint(b"not-gzip") is None


def test_inflate_batch_partial_retry():
    """Mixed batch: a high-ratio member forces growth for ONE entry only;
    results stay correct and ordered."""
    rng = np.random.default_rng(5)
    small = rng.integers(0, 255, 1000, dtype=np.uint8).tobytes()
    big = bytes(2 << 20)  # very high compression ratio
    datas = [small, big, small]
    # strip the gzip trailer hint by wrapping in zlib (no ISIZE available)
    import zlib as _z
    blobs = [_z.compress(d) for d in datas]
    assert cmrio.inflate_batch(blobs) == datas


def test_multimember_boundary_exactly_at_capacity():
    """A gzip member ending exactly when the output buffer fills, with more
    members remaining, must grow-and-retry — not silently truncate to the
    first member."""
    import gzip
    from cmrtpu.native import cmrio

    first = b"\x00" * (1 << 16)   # decompressed size == the 64 KiB cap floor
    second = b"tail-member-payload" * 7
    blob = gzip.compress(first, 1) + gzip.compress(second, 1)
    # size_hint pins cap to exactly len(first): the first member ends with
    # avail_out == 0 and input remaining
    assert cmrio.inflate(blob, size_hint=len(first)) == first + second


def test_truncated_gzip_fails_fast_not_grow_loop():
    """A truncated gzip stream must raise promptly (input starvation), not
    spin the grow-and-retry loop reserved for too-small output buffers."""
    import gzip
    import zlib

    import pytest

    from cmrtpu.native import cmrio

    blob = gzip.compress(b"x" * 100000)
    truncated = blob[:len(blob) // 2]
    with pytest.raises((zlib.error, EOFError)):
        cmrio.inflate(truncated)
