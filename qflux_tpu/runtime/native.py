"""ctypes bindings to the native host runtime (csrc/libqflux_host.so).

Auto-builds on first use (`make -C csrc`, plain g++) and degrades to pure
Python/numpy when a compiler is unavailable — every entry point has an exact
fallback, so the native path is a performance feature, never a dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libqflux_host.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.xxh64.restype = ctypes.c_uint64
        lib.xxh64.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
        lib.xxh64_file.restype = ctypes.c_uint64
        lib.xxh64_file.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.u8_to_f32.restype = None
        lib.u8_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_uint64, ctypes.c_float,
                                  ctypes.c_float, ctypes.c_int]
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        logging.info("native host library unavailable (%s); using Python fallbacks", e)
    return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# hashing

def xxh64_bytes(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is not None:
        return int(lib.xxh64(data, len(data), seed))
    return _xxh64_py(data, seed)


def xxh64_file(path: str | os.PathLike, seed: int = 0) -> str:
    """Hex digest of a file's contents (streamed).

    The Python fallback is an incremental XXH64 (32-byte lane state carried
    across chunks) — BIT-EXACT with the native streamed digest and the
    one-shot `_xxh64_py`, without reading multi-GB files into memory."""
    lib = _load()
    if lib is not None:
        h = int(lib.xxh64_file(str(path).encode(), seed))
        if h:
            return f"{h:016x}"

    def chunks():
        with open(path, "rb") as f:
            while True:
                c = f.read(8 << 20)
                if not c:
                    return
                yield c

    return f"{_xxh64_stream(chunks(), seed):016x}"


def _xxh64_stream(chunks, seed: int = 0) -> int:
    """Incremental XXH64 over an iterable of byte chunks (bit-exact with
    `_xxh64_py` on the concatenation)."""
    M = (1 << 64) - 1
    P1, P2, P3, P4, P5 = (11400714785074694791, 14029467366897019727,
                          1609587929392839161, 9650029242287828579,
                          2870177450012600261)

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def rnd(acc, inp):
        return (rotl((acc + inp * P2) & M, 31) * P1) & M

    v = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M, (seed - P1) & M]
    total, striped, buf = 0, False, b""
    for chunk in chunks:
        buf += chunk
        total += len(chunk)
        usable = len(buf) - (len(buf) % 32)
        i = 0
        while i < usable:
            for j in range(4):
                v[j] = rnd(v[j], int.from_bytes(buf[i:i + 8], "little"))
                i += 8
            striped = True
        buf = buf[usable:]

    if striped:
        h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12) + rotl(v[3], 18)) & M
        for j in range(4):
            h = ((h ^ rnd(0, v[j])) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + total) & M
    i, n = 0, len(buf)
    while i + 8 <= n:
        h = (rotl(h ^ rnd(0, int.from_bytes(buf[i:i + 8], "little")), 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h = (rotl(h ^ (int.from_bytes(buf[i:i + 4], "little") * P1) & M, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ (buf[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    """Pure-python XXH64 (bit-exact with the native one)."""
    M = (1 << 64) - 1
    P1, P2, P3, P4, P5 = (11400714785074694791, 14029467366897019727,
                          1609587929392839161, 9650029242287828579,
                          2870177450012600261)

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def rnd(acc, inp):
        return (rotl((acc + inp * P2) & M, 31) * P1) & M

    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M, (seed - P1) & M]
        while i + 32 <= n:
            for j in range(4):
                v[j] = rnd(v[j], int.from_bytes(data[i:i + 8], "little"))
                i += 8
        h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12) + rotl(v[3], 18)) & M
        for j in range(4):
            h = ((h ^ rnd(0, v[j])) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h = (rotl(h ^ rnd(0, int.from_bytes(data[i:i + 8], "little")), 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h = (rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * P1) & M, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ (data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# pixel prep

def u8_to_f32(src: np.ndarray, scale: float = 1.0 / 127.5, shift: float = -1.0,
              n_threads: int = 0) -> np.ndarray:
    """uint8 array → float32 (x·scale + shift), natively threaded."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    out = np.empty(src.shape, np.float32)
    lib = _load()
    if lib is not None:
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 8)
        lib.u8_to_f32(src.ctypes.data, out.ctypes.data, src.size,
                      ctypes.c_float(scale), ctypes.c_float(shift), n_threads)
        return out
    np.multiply(src, scale, out=out, casting="unsafe")
    out += shift
    return out
