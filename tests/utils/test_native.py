"""Native host runtime (C++ via ctypes) vs Python fallbacks."""

import numpy as np
import pytest

from qflux_tpu.runtime import native


def test_native_builds_and_loads():
    assert native.available(), "csrc should compile in this environment (g++ present)"


def test_xxh64_known_vectors():
    # XXH64 official test vectors (seed 0)
    assert native.xxh64_bytes(b"") == 0xEF46DB3751D8E999
    assert native.xxh64_bytes(b"a") == 0xD24EC4F1A98C6E5B
    assert native.xxh64_bytes(b"abc") == 0x44BC2CF5AD770999


def test_python_fallback_bitexact():
    rng = np.random.default_rng(0)
    for n in [0, 1, 3, 4, 7, 8, 31, 32, 33, 100, 1000]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.xxh64_bytes(data) == native._xxh64_py(data), n
        assert native.xxh64_bytes(data, seed=123) == native._xxh64_py(data, seed=123), n


def test_xxh64_file(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"x" * (5 << 20))
    h1 = native.xxh64_file(p)
    assert len(h1) == 16
    p2 = tmp_path / "g.bin"
    p2.write_bytes(b"x" * (5 << 20))
    assert native.xxh64_file(p2) == h1  # content-addressed
    p3 = tmp_path / "h.bin"
    p3.write_bytes(b"y" + b"x" * ((5 << 20) - 1))
    assert native.xxh64_file(p3) != h1


def test_u8_to_f32_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (33, 17, 3), dtype=np.uint8)
    out = native.u8_to_f32(x)
    ref = x.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_xxh64_stream_bit_exact_with_one_shot():
    """The streaming fallback must produce the one-shot digest for every
    tail-length class (0/1/4/8-byte finalization paths, stripe boundaries)
    regardless of chunking."""
    import numpy as np

    from qflux_tpu.runtime.native import _xxh64_py, _xxh64_stream

    rng = np.random.default_rng(7)
    for n in (0, 1, 5, 31, 32, 33, 63, 64, 100, 1024, 100_003):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        ref = _xxh64_py(data, seed=3)
        for chunk in (7, 32, 8192):
            got = _xxh64_stream(
                (data[i:i + chunk] for i in range(0, n, chunk)), seed=3)
            assert got == ref, (n, chunk)


def test_xxh64_file_streams_large(tmp_path):
    import numpy as np

    from qflux_tpu.runtime.native import _xxh64_py, xxh64_file

    data = np.random.default_rng(0).integers(0, 256, 3_000_011,
                                             dtype=np.uint8).tobytes()
    f = tmp_path / "blob.bin"
    f.write_bytes(data)
    assert xxh64_file(f) == f"{_xxh64_py(data):016x}"
