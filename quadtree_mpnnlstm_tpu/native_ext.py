"""ctypes bindings for the native host toolkit (native/qtm_host.cpp).

Builds on demand with ``make -C native`` (g++). Everything here has a pure
numpy fallback elsewhere in the package — the native path accelerates
host-side mesh construction and synthetic data generation (the work that
feeds the TPU input pipeline)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libqtmhost.so")

_CONDITIONS = {
    "max_larger_than": 0,
    "max_smaller_than": 1,
    "min_larger_than": 2,
    "min_smaller_than": 3,
}


class _QtParams(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_int64),
        ("cols", ctypes.c_int64),
        ("max_size", ctypes.c_int64),
        ("thresh", ctypes.c_double),
        ("padding", ctypes.c_int64),
        ("condition", ctypes.c_int32),
        ("has_mask", ctypes.c_int32),
        ("has_hir", ctypes.c_int32),
    ]


_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library; returns success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32, u64 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.qtm_quadtree_decompose.restype = i64
    lib.qtm_quadtree_decompose.argtypes = [
        ctypes.POINTER(_QtParams), f64p, u8p, u8p, i64p
    ]
    lib.qtm_adjacency.restype = i64
    lib.qtm_adjacency.argtypes = [i64p, i64, i64, i32, i64p, i64p, i64]
    lib.qtm_moving_sprites.restype = None
    lib.qtm_moving_sprites.argtypes = [
        f32p, i64, i64, i64, i64, i64, i64, i64,
        ctypes.c_float, ctypes.c_float, u64, f32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def quadtree_decompose(
    img: np.ndarray,
    thresh: float = 0.05,
    max_size: int = 8,
    mask: Optional[np.ndarray] = None,
    high_interest_region: Optional[np.ndarray] = None,
    padding: int = 0,
    condition: str = "max_larger_than",
) -> Tuple[np.ndarray, int]:
    """Native quadtree labels; returns (labels (rows, cols) int64, n_nodes)."""
    lib = load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, dtype=np.float64)
    rows, cols = img.shape
    p = _QtParams(
        rows, cols, max_size, thresh, padding, _CONDITIONS[condition],
        int(mask is not None), int(high_interest_region is not None),
    )
    maskc = (
        np.ascontiguousarray(mask, dtype=np.uint8)
        if mask is not None
        else None
    )
    hirc = (
        np.ascontiguousarray(high_interest_region, dtype=np.uint8)
        if high_interest_region is not None
        else None
    )
    labels = np.empty((rows, cols), dtype=np.int64)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty)) if a is not None else None

    n = lib.qtm_quadtree_decompose(
        ctypes.byref(p),
        ptr(img, ctypes.c_double),
        ptr(maskc, ctypes.c_uint8),
        ptr(hirc, ctypes.c_uint8),
        ptr(labels, ctypes.c_int64),
    )
    return labels, int(n)


def adjacency(
    labels: np.ndarray, corners: bool = False, cap: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Deduplicated directed edges sorted by (dst, src)."""
    lib = load()
    assert lib is not None, "native library unavailable"
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    rows, cols = labels.shape
    cap = cap or rows * cols * (8 if corners else 4)
    src = np.empty(cap, dtype=np.int64)
    dst = np.empty(cap, dtype=np.int64)
    n = lib.qtm_adjacency(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rows, cols, int(corners),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cap,
    )
    n = min(int(n), cap)
    return src[:n].copy(), dst[:n].copy()


def moving_sprites(
    sprites: np.ndarray,
    n_samples: int,
    t_total: int,
    canvas: int,
    n_digits: int = 1,
    pixel_noise: float = 0.05,
    velocity_noise: float = 0.25,
    seed: int = 0,
) -> np.ndarray:
    """Native bouncing-sprite video batch: (N, T, canvas, canvas) float32."""
    lib = load()
    assert lib is not None, "native library unavailable"
    sprites = np.ascontiguousarray(sprites, dtype=np.float32)
    ns, sh, sw = sprites.shape
    out = np.empty((n_samples, t_total, canvas, canvas), dtype=np.float32)
    lib.qtm_moving_sprites(
        sprites.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ns, sh, sw, n_samples, t_total, canvas, n_digits,
        ctypes.c_float(pixel_noise), ctypes.c_float(velocity_noise),
        ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
