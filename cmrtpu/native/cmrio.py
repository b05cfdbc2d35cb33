"""ctypes wrappers over libcmrio with pure-Python fallbacks.

These are the only entry points the rest of the framework uses; callers
never touch ctypes directly. Every function works identically (bit-exact
payloads) whether the native library is present or not.
"""

from __future__ import annotations

import ctypes
import gzip
import os
import zlib
from typing import List, Optional, Sequence

import numpy as np

from cmrtpu.native.build import get_library

_u8p = ctypes.POINTER(ctypes.c_uint8)


def _as_u8p(buf) -> "ctypes._Pointer":
    return ctypes.cast(ctypes.addressof(ctypes.c_char.from_buffer(buf)), _u8p)


def _ro_u8p(data: bytes) -> "ctypes._Pointer":
    return ctypes.cast(ctypes.c_char_p(data), _u8p)


def inflate(data: bytes, size_hint: Optional[int] = None) -> bytes:
    """Decompress a zlib/gzip stream (multi-member gzip supported)."""
    lib = get_library()
    if lib is None:
        return zlib.decompress(data, zlib.MAX_WBITS | 32)
    cap = max(size_hint or 0, 4 * len(data), 1 << 16)
    for _ in range(8):
        out = bytearray(cap)
        n = lib.cmr_inflate(_ro_u8p(data), len(data), _as_u8p(out), cap)
        if n >= 0:
            return bytes(out[:n])
        if n == -2:
            cap *= 4
            continue
        raise zlib.error("cmr_inflate failed")
    raise zlib.error("cmr_inflate: output larger than expected")


def deflate_gzip(data: bytes, level: int = 1) -> bytes:
    """Gzip-compress ``data`` (container format, readable by any gzip)."""
    lib = get_library()
    if lib is None:
        return gzip.compress(data, compresslevel=level)
    cap = len(data) + len(data) // 2 + 1024
    out = bytearray(cap)
    n = lib.cmr_deflate_gzip(_ro_u8p(data), len(data), _as_u8p(out), cap, level)
    if n == -2:  # incompressible payload; retry with worst-case bound
        cap = len(data) * 2 + 4096
        out = bytearray(cap)
        n = lib.cmr_deflate_gzip(_ro_u8p(data), len(data), _as_u8p(out), cap, level)
    if n < 0:
        raise zlib.error("cmr_deflate_gzip failed")
    return bytes(out[:n])


def read_file_bytes(path: str) -> bytes:
    """Whole-file read through the native core (falls back to open/read)."""
    lib = get_library()
    if lib is None:
        with open(path, "rb") as fh:
            return fh.read()
    size = os.path.getsize(path)
    out = bytearray(size)
    actual = ctypes.c_int64(0)
    n = lib.cmr_read_file(path.encode(), _as_u8p(out) if size else _u8p(),
                          size, ctypes.byref(actual))
    if n == -2:  # grew between stat and read
        out = bytearray(actual.value)
        n = lib.cmr_read_file(path.encode(), _as_u8p(out), actual.value,
                              ctypes.byref(actual))
    if n < 0:
        raise OSError(f"cmr_read_file failed for {path}")
    return bytes(out[:n])


def inflate_batch(blobs: Sequence[bytes],
                  size_hints: Optional[Sequence[int]] = None,
                  n_threads: int = 0) -> List[bytes]:
    """Decompress many streams on a native thread pool (no GIL in the loop).

    The host-parallel analogue of the reference generator's per-element
    ThreadPoolExecutor fan-out (ref: src/data/Generators.py:89-94).
    """
    lib = get_library()
    if lib is None:
        return [zlib.decompress(b, zlib.MAX_WBITS | 32) for b in blobs]
    n = len(blobs)
    if n == 0:
        return []
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 4)
    caps = [max((size_hints[i] if size_hints else 0), 4 * len(blobs[i]), 1 << 16)
            for i in range(n)]
    for _ in range(8):
        dsts = [bytearray(c) for c in caps]
        src_arr = (_u8p * n)(*[_ro_u8p(b) for b in blobs])
        srclen_arr = (ctypes.c_int64 * n)(*[len(b) for b in blobs])
        dst_arr = (_u8p * n)(*[_as_u8p(d) for d in dsts])
        cap_arr = (ctypes.c_int64 * n)(*caps)
        out_arr = (ctypes.c_int64 * n)()
        lib.cmr_inflate_batch(src_arr, srclen_arr, dst_arr, cap_arr, out_arr,
                              n, n_threads)
        if any(out_arr[i] == -1 for i in range(n)):
            raise zlib.error("cmr_inflate_batch failed")
        if all(out_arr[i] >= 0 for i in range(n)):
            return [bytes(dsts[i][:out_arr[i]]) for i in range(n)]
        caps = [c * 4 if out_arr[i] == -2 else c for i, c in enumerate(caps)]
    raise zlib.error("cmr_inflate_batch: output larger than expected")


def inflate_into(data: bytes, out: np.ndarray) -> int:
    """Decompress directly into a preallocated numpy buffer (zero copy-out).
    Returns bytes written."""
    lib = get_library()
    if lib is None:
        raw = zlib.decompress(data, zlib.MAX_WBITS | 32)
        flat = out.reshape(-1).view(np.uint8)
        flat[:len(raw)] = np.frombuffer(raw, np.uint8)
        return len(raw)
    flat = out.reshape(-1).view(np.uint8)
    ptr = flat.ctypes.data_as(_u8p)
    n = lib.cmr_inflate(_ro_u8p(data), len(data), ptr, flat.nbytes)
    if n < 0:
        raise zlib.error("cmr_inflate_into failed")
    return int(n)
