"""ctypes loader for the native hostcodec library (native/hostcodec.cpp).

Host-side packed-bit plumbing and CRC engines in C++ — the native analogue
of the reference's BitContainer/CRC host path. The library is built on
first use with the repo Makefile (g++ is in the base image; pybind11 is
not, hence ctypes). All entry points degrade gracefully: if the compiler
or library is unavailable, callers fall back to the NumPy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhostcodec.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libhostcodec.so"],
            cwd=os.path.abspath(_NATIVE_DIR),
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The hostcodec library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.hc_pack_bits.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.hc_unpack_bits.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.hc_gather_bits.argtypes = [
        u8p, ctypes.c_size_t, ctypes.c_size_t, i64p, ctypes.c_size_t, u8p
    ]
    lib.hc_scatter_bits.argtypes = [
        u8p, ctypes.c_size_t, ctypes.c_size_t, i64p, ctypes.c_size_t, u8p
    ]
    lib.hc_crc_msb_first.argtypes = [
        u8p, ctypes.c_size_t, ctypes.c_uint64, ctypes.c_uint, ctypes.c_uint64
    ]
    lib.hc_crc_msb_first.restype = ctypes.c_uint64
    lib.hc_crc32c_bytes.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint32]
    lib.hc_crc32c_bytes.restype = ctypes.c_uint32
    lib.hc_crc_rows.argtypes = [
        u8p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_uint64,
        ctypes.c_uint, ctypes.c_uint64, u64p,
    ]
    lib.hc_butterfly_rows.argtypes = [u8p, ctypes.c_size_t, ctypes.c_size_t]
    lib.hc_cmac_available.restype = ctypes.c_int
    lib.hc_cmac_rows.argtypes = [
        u8p, u8p, ctypes.c_size_t, ctypes.c_size_t, u8p
    ]
    lib.hc_cmac_rows.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def crc_msb_first(bits: np.ndarray, poly: int, width: int, init: int) -> int:
    lib = load()
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    if lib is None:
        from ..models.detectors import crc_msb_first as py_crc

        return py_crc(bits, poly, width, init)
    return int(lib.hc_crc_msb_first(bits, bits.size, poly, width, init))


def crc_rows(bits: np.ndarray, poly: int, width: int, init: int) -> np.ndarray:
    """Per-row bit-level CRC over a [rows, bits] array."""
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    rows, row_bits = bits.shape
    lib = load()
    if lib is None:
        from ..models.detectors import crc_msb_first as py_crc

        return np.array(
            [py_crc(bits[r], poly, width, init) for r in range(rows)],
            dtype=np.uint64,
        )
    out = np.empty(rows, dtype=np.uint64)
    lib.hc_crc_rows(bits, row_bits, rows, poly, width, init, out)
    return out


def crc32c_bytes(data: bytes, init: int = 0) -> int:
    lib = load()
    if lib is None:
        from ..models.detectors import crc32c_bytes as py_crc

        return py_crc(data, init)
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    return int(lib.hc_crc32c_bytes(np.ascontiguousarray(buf), buf.size, init))


def cmac_available() -> bool:
    """True when the system libcrypto CMAC engine is reachable."""
    lib = load()
    return lib is not None and bool(lib.hc_cmac_available())


def cmac_rows(key: bytes, msgs: np.ndarray) -> Optional[np.ndarray]:
    """Batched AES-128-CMAC tags over [rows, msg_bytes] uint8 messages.

    Returns [rows, 16] uint8 tags via the native libcrypto path (the
    reference's own engine, cmac.cpp:10-111), or None when unavailable —
    callers fall back to the pure-Python RFC 4493 implementation."""
    lib = load()
    if lib is None or not lib.hc_cmac_available():
        return None
    msgs = np.ascontiguousarray(msgs, dtype=np.uint8)
    rows, msg_bytes = msgs.shape
    key_arr = np.frombuffer(bytes(key), dtype=np.uint8)
    if key_arr.size != 16:
        raise ValueError("AES-128-CMAC needs a 16-byte key")
    tags = np.empty((rows, 16), dtype=np.uint8)
    rc = lib.hc_cmac_rows(
        np.ascontiguousarray(key_arr), msgs, msg_bytes, rows, tags
    )
    if rc != 0:
        return None
    return tags


def butterfly_rows(bits: np.ndarray) -> np.ndarray:
    """In-place-free polar transform over [rows, N] {0,1} (host golden)."""
    bits = np.ascontiguousarray(bits, dtype=np.uint8).copy()
    rows, n = bits.shape
    lib = load()
    if lib is None:
        x = bits
        s = 1
        while s < n:
            for i in range(0, n, 2 * s):
                x[:, i : i + s] ^= x[:, i + s : i + 2 * s]
            s *= 2
        return x
    lib.hc_butterfly_rows(bits, n, rows)
    return bits
