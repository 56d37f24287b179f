"""ctypes loader for the native host-pipeline library (native/raie_native.cpp).

Builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-numpy fallback so the package works
without a toolchain. ``python -m ...utils.native`` builds eagerly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "raie_native.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libraie_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-march=native", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def load():
    """The ctypes lib, building if needed; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i64, f32, u64, i32 = (ctypes.c_int64, ctypes.c_float,
                              ctypes.c_uint64, ctypes.c_int)
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.raie_input_mask_f32.argtypes = [fp, i64, f32, f32, u64, i32]
        lib.raie_mask_frames_f32.argtypes = [fp, i64, i64, fp, f32, u64, i32]
        lib.raie_geometric_f32.argtypes = [fp, fp, i64, i64, i64, i32, i32]
        lib.raie_u8_to_f32_norm.argtypes = [u8p, fp, i64, i64, i32, i32]
        lib.raie_native_abi_version.restype = i32
        if lib.raie_native_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def input_mask(img: np.ndarray, prob: float, value: float = 0.1,
               seed: int = 0, nthreads: int = 0) -> np.ndarray:
    """In-place-free multiplicative Bernoulli mask (input_mask semantics:
    kept pixels unchanged, dropped -> -value)."""
    lib = load()
    out = np.ascontiguousarray(img, dtype=np.float32).copy()
    if lib is None:
        rng = np.random.default_rng(seed)
        keep = (rng.random(out.shape) >= min(prob, 1.0)).astype(np.float32)
        return out * keep - value + value * keep
    lib.raie_input_mask_f32(_fptr(out), out.size, float(prob), float(value),
                            int(seed) & (2**64 - 1), nthreads)
    return out


def mask_frames(stack: np.ndarray, probs: np.ndarray, value: float = 0.1,
                seed: int = 0, nthreads: int = 0) -> np.ndarray:
    """Per-frame masking of an (F, H, W) stack with per-frame probs."""
    lib = load()
    out = np.ascontiguousarray(stack, dtype=np.float32).copy()
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    f = out.shape[0]
    hw = out.size // f
    if lib is None:
        rng = np.random.default_rng(seed)
        for i in range(f):
            keep = (rng.random(out[i].shape) >= min(float(probs[i]), 1.0)
                    ).astype(np.float32)
            out[i] = out[i] * keep - value + value * keep
        return out
    lib.raie_mask_frames_f32(_fptr(out), f, hw, _fptr(probs), float(value),
                             int(seed) & (2**64 - 1), nthreads)
    return out


def geometric(img: np.ndarray, mode: int, nthreads: int = 0) -> np.ndarray:
    """The 8 flip/rot90 aug modes on (H, W[, C]) float32."""
    lib = load()
    squeeze = img.ndim == 2
    src = np.ascontiguousarray(img[..., None] if squeeze else img,
                               dtype=np.float32)
    h, w, c = src.shape
    if lib is None:
        from ..data.transforms import data_augmentation

        out = np.ascontiguousarray(data_augmentation(src, mode))
    else:
        if mode in (2, 3, 6, 7):
            out = np.empty((w, h, c), np.float32)
        else:
            out = np.empty((h, w, c), np.float32)
        lib.raie_geometric_f32(_fptr(src), _fptr(out), h, w, c, mode, nthreads)
    return out[..., 0] if squeeze else out


def u8_to_f32(img: np.ndarray, bgr2rgb: bool = False,
              nthreads: int = 0) -> np.ndarray:
    """uint8 HWC -> float32 [0,1], optional BGR->RGB."""
    lib = load()
    src = np.ascontiguousarray(img, dtype=np.uint8)
    c = src.shape[-1] if src.ndim == 3 else 1
    if lib is None:
        out = src.astype(np.float32) / 255.0
        if bgr2rgb and c == 3:
            out = np.ascontiguousarray(out[..., ::-1])
        return out
    out = np.empty(src.shape, np.float32)
    lib.raie_u8_to_f32_norm(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fptr(out),
        src.size, c, int(bgr2rgb), nthreads)
    return out


if __name__ == "__main__":
    ok = _build()
    print(f"native build {'ok' if ok else 'FAILED'}: {_LIB}")
