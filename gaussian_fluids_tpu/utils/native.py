"""ctypes bindings for the native C++ runtime components (native/
gf_native.cpp), built on demand with g++ and cached. Every entry point has
a pure-Python fallback, so the framework works without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "gf_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "gf_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def load():
    """Returns the ctypes library, building it on first use; None if the
    build fails (callers fall back to Python)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            # a prebuilt .so without the source alongside is fine — only
            # rebuild when the source exists AND is newer
            if (not os.path.exists(_SO)
                    or (os.path.exists(_SRC)
                        and os.path.getmtime(_SO) < os.path.getmtime(_SRC))):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.vti_write_f32.restype = ctypes.c_int
            lib.vti_write_f32.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_char_p]
            lib.parse_obj_open.restype = ctypes.c_int
            lib.parse_obj_open.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.parse_obj_fill.restype = ctypes.c_int
            lib.parse_obj_fill.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.blue_noise_2d.restype = ctypes.c_int
            lib.blue_noise_2d.argtypes = [
                ctypes.c_int64, ctypes.c_uint64, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_double)]
            _lib = lib
        except Exception as e:  # pragma: no cover
            print(f"[native] build/load failed ({e}); using Python "
                  f"fallbacks")
            _lib = None
        return _lib


def vti_write_f32(path: str, data: np.ndarray, origin, spacing,
                  name: str = "scalars") -> bool:
    lib = load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float32)
    nx, ny, nz = data.shape
    o = (ctypes.c_double * 3)(*[float(v) for v in origin])
    s = (ctypes.c_double * 3)(*[float(v) for v in spacing])
    rc = lib.vti_write_f32(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, o, s, name.encode())
    return rc == 0


_parse_lock = threading.Lock()


def parse_obj(path: str):
    """Returns (vertices (V,3) f32, normals (Nn,3) f32, faces (F,3) i32,
    facenormals (F,3) i32) or None on fallback.

    The C side stages the parse in a process-global between the count and
    fill calls, so the open+fill pair is serialized here; a failed fill
    (e.g. a mismatched call sequence) falls back to the Python parser
    instead of returning uninitialized arrays."""
    lib = load()
    if lib is None:
        return None
    with _parse_lock:
        nv = ctypes.c_int64()
        nn = ctypes.c_int64()
        nf = ctypes.c_int64()
        if lib.parse_obj_open(path.encode(), ctypes.byref(nv),
                              ctypes.byref(nn), ctypes.byref(nf)) != 0:
            return None
        v = np.empty((nv.value, 3), np.float32)
        n = np.empty((nn.value, 3), np.float32)
        f = np.empty((nf.value, 3), np.int32)
        fn = np.empty((nf.value, 3), np.int32)
        rc = lib.parse_obj_fill(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            fn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            return None
    return v, n, f, fn


def blue_noise_2d(n: int, seed: int = 0, x_min=0.0, x_max=1.0, y_min=0.0,
                  y_max=1.0, candidates: int = 50):
    """Best-candidate sampling (reference 2D/GSR.py:650-664); falls back to
    the O(n^2 k) numpy loop if the native lib is unavailable."""
    lib = load()
    if lib is not None:
        out = np.empty((n, 2), np.float64)
        if lib.blue_noise_2d(
                n, seed, x_min, x_max, y_min, y_max, candidates,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))) == 0:
            return out
    rng = np.random.RandomState(seed)
    scale = np.asarray([x_max - x_min, y_max - y_min])
    off = np.asarray([x_min, y_min])
    samples = np.zeros((n, 2))
    samples[0] = rng.random_sample(2) * scale + off
    for i in range(1, n):
        cand = rng.random_sample((candidates, 2)) * scale + off
        d = ((cand[:, None, :] - samples[None, :i, :]) ** 2).sum(-1).min(1)
        samples[i] = cand[d.argmax()]
    return samples
