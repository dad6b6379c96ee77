"""Native (C++) ingest must agree bit-for-bit with the NumPy readers.

The C++ runtime (bioem_tpu/runtime/src/bioem_io.cpp) is the rebuild of the
reference's OpenMP-parallel file ingest (/root/reference/map.cpp:85-193,
268-414, model.cpp:114-243); the NumPy readers in bioem_tpu.io are the
semantic spec. Skipped when no C++ toolchain is available.
"""

import numpy as np
import pytest

from bioem_tpu.io.map_io import ImageStack, read_mrc_maps, read_text_maps
from bioem_tpu.io.model_io import Model, read_text_model
from bioem_tpu.io.mrc import write_mrc
from bioem_tpu.runtime import native


pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native IO library unavailable"
)


def _write_text_maps(path, stack):
    with open(path, "w") as f:
        for b, m in enumerate(stack):
            f.write(f"PARTICLE  {b}\n")
            n = m.shape[0]
            for i in range(n):
                for j in range(n):
                    f.write(f"{i:8d}{j:8d}{m[i, j]:16.8f}\n")


def test_mrc_native_matches_numpy(rng, tmp_path):
    stack = rng.normal(0, 1, (5, 16, 16)).astype(np.float32)
    path = str(tmp_path / "stack.mrc")
    write_mrc(path, stack)

    for normalize in (True, False):
        fast = native.read_mrc_stack(path, 16, normalize)
        assert fast is not None
        import bioem_tpu.runtime.native as nat
        import bioem_tpu.io.map_io as mio

        # Force the pure-NumPy path by monkeypatch-free comparison: re-read
        # with native disabled via the module-level fallback implementation.
        from bioem_tpu.io.mrc import read_mrc_data, read_mrc_header

        hdr = read_mrc_header(path)
        data = read_mrc_data(path, hdr)
        ref = np.ascontiguousarray(np.transpose(data, (0, 2, 1)))
        if normalize:
            ref = mio._normalize_stack(ref)
        np.testing.assert_array_equal(fast, ref)


def test_mrc_big_endian(rng, tmp_path):
    """Endianness auto-detection (reference mrc.h:72-149)."""
    stack = rng.normal(0, 1, (3, 8, 8)).astype(np.float32)
    path = str(tmp_path / "le.mrc")
    write_mrc(path, stack)
    with open(path, "rb") as f:
        raw = bytearray(f.read())
    # Byte-swap the whole file (header words + data) to fake big-endian.
    hdr = np.frombuffer(bytes(raw[:1024]), dtype="<u4").byteswap()
    data = np.frombuffer(bytes(raw[1024:]), dtype="<f4").byteswap()
    path_be = str(tmp_path / "be.mrc")
    with open(path_be, "wb") as f:
        f.write(hdr.tobytes())
        f.write(data.tobytes())
    a = native.read_mrc_stack(path, 8, True)
    b = native.read_mrc_stack(path_be, 8, True)
    np.testing.assert_array_equal(a, b)


def test_text_maps_native_matches_numpy(rng, tmp_path):
    stack = rng.normal(0, 1, (3, 8, 8)).astype(np.float32)
    path = str(tmp_path / "parts.txt")
    _write_text_maps(path, stack)
    fast = read_text_maps(path, 8)  # dispatches to native when available
    np.testing.assert_allclose(fast.maps, stack, atol=5e-8)
    assert fast.maps.dtype == np.float32


def test_text_maps_bad_pixel_raises(tmp_path):
    path = str(tmp_path / "bad.txt")
    with open(path, "w") as f:
        f.write("PARTICLE  0\n")
        f.write(f"{9:8d}{0:8d}{1.0:16.8f}\n")
    with pytest.raises(Exception, match="Reading map"):
        read_text_maps(path, 4)


def test_text_model_native_matches_numpy(rng, tmp_path):
    rows = rng.uniform(-10, 10, (20, 5))
    rows[:, 3] = np.abs(rows[:, 3]) + 0.5
    path = str(tmp_path / "model.txt")
    with open(path, "w") as f:
        f.write("# comment line\n")
        for r in rows:
            f.write(" ".join(f"{v:.9g}" for v in r) + "\n")
    m = read_text_model(path)
    ref = np.loadtxt(path, dtype=np.float64, ndmin=2)
    np.testing.assert_array_equal(m.points, ref[:, :3].astype(np.float32))
    np.testing.assert_array_equal(m.radii, ref[:, 3].astype(np.float32))
    np.testing.assert_array_equal(m.densities, ref[:, 4].astype(np.float32))
