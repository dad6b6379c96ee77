"""ctypes bindings for the C++ ingest runtime (src/bioem_io.cpp).

The library is compiled on demand with g++ (cached by source mtime) and
loaded lazily; every entry point has a NumPy fallback in bioem_tpu.io, so a
missing toolchain degrades gracefully. Disable with BIOEM_TPU_NATIVE_IO=0.

The C++ tier mirrors the reference's native readers
(/root/reference/map.cpp, model.cpp, include/mrc.h) — multi-threaded parse
of production-scale particle stacks, the one host-side path where Python
throughput actually matters (SURVEY.md §2 "Parallel file ingest").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ERR_LEN = 512
_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "bioem_io.cpp")
_LIB = os.path.join(_DIR, "libbioem_io.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def native_io_enabled() -> bool:
    return os.environ.get("BIOEM_TPU_NATIVE_IO", "1") != "0"


def _build() -> bool:
    """Compile the shared library if missing or stale. Returns success."""
    try:
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return True
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3", "-march=native", "-std=c++17", "-fPIC", "-Wall",
            "-shared", "-pthread",
            "-o", _LIB, _SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not native_io_enabled() or not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib_failed = True
            return None
        c_char_p = ctypes.c_char_p
        c_int = ctypes.c_int
        c_long = ctypes.c_long
        f32_p = ctypes.POINTER(ctypes.c_float)
        f64_p = ctypes.POINTER(ctypes.c_double)
        int_p = ctypes.POINTER(c_int)
        long_p = ctypes.POINTER(c_long)
        lib.bio_mrc_stack_info.argtypes = [c_char_p, c_int, int_p, c_char_p]
        lib.bio_read_mrc_stack.argtypes = [c_char_p, c_int, c_int, f32_p, c_int, c_char_p]
        lib.bio_text_maps_info.argtypes = [c_char_p, int_p, c_char_p]
        lib.bio_read_text_maps.argtypes = [c_char_p, c_int, f32_p, c_int, c_char_p]
        lib.bio_text_model_info.argtypes = [c_char_p, long_p, c_char_p]
        lib.bio_read_text_model.argtypes = [c_char_p, f64_p, c_long, c_char_p]
        lib.bio_maps_dump_info.argtypes = [c_char_p, int_p, c_char_p]
        lib.bio_read_maps_dump.argtypes = [c_char_p, c_int, f32_p, c_int, c_char_p]
        _lib = lib
        return _lib


class NativeIOError(IOError):
    pass


def _err_buf():
    return ctypes.create_string_buffer(_ERR_LEN)


def _raise(err):
    raise NativeIOError(err.value.decode("utf-8", "replace"))


def read_mrc_stack(path: str, n_pixels: int, normalize: bool):
    """(n_img, N, N) float32 stack, or None if native IO unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    err = _err_buf()
    n_img = ctypes.c_int()
    if lib.bio_mrc_stack_info(path.encode(), n_pixels, ctypes.byref(n_img), err):
        _raise(err)
    out = np.empty((n_img.value, n_pixels, n_pixels), np.float32)
    if lib.bio_read_mrc_stack(
        path.encode(), n_pixels, int(normalize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_img.value, err,
    ):
        _raise(err)
    return out


def read_text_maps(path: str, n_pixels: int):
    lib = get_lib()
    if lib is None:
        return None
    err = _err_buf()
    n_img = ctypes.c_int()
    if lib.bio_text_maps_info(path.encode(), ctypes.byref(n_img), err):
        _raise(err)
    out = np.empty((n_img.value, n_pixels, n_pixels), np.float32)
    if lib.bio_read_text_maps(
        path.encode(), n_pixels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_img.value, err,
    ):
        _raise(err)
    return out


def read_text_model(path: str):
    """(n_points, 5) float64 rows (x y z radius density), or None."""
    lib = get_lib()
    if lib is None:
        return None
    err = _err_buf()
    n_pts = ctypes.c_long()
    if lib.bio_text_model_info(path.encode(), ctypes.byref(n_pts), err):
        _raise(err)
    out = np.empty((n_pts.value, 5), np.float64)
    if lib.bio_read_text_model(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_pts.value, err,
    ):
        _raise(err)
    return out


def read_maps_dump(path: str, n_pixels: int):
    lib = get_lib()
    if lib is None:
        return None
    err = _err_buf()
    n_img = ctypes.c_int()
    if lib.bio_maps_dump_info(path.encode(), ctypes.byref(n_img), err):
        _raise(err)
    out = np.empty((n_img.value, n_pixels, n_pixels), np.float32)
    if lib.bio_read_maps_dump(
        path.encode(), n_pixels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_img.value, err,
    ):
        _raise(err)
    return out
