"""ctypes bindings for the native C++ batch sampler/prefetcher.

The native runtime component of the data stack (``native/batch_sampler.cpp``):
index-table construction, fixed-shape batch draws, sky-ray draws, and a
background prefetch thread with a ring buffer — replacing the reference's
CacheDataloader worker processes (``neusky_datamanager.py:169-198``) with a
zero-copy in-process design.

Builds the .so on demand with g++ if it is missing; falls back cleanly when
no toolchain is available (callers use the numpy PixelSampler path).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libbatch_sampler.so"

_lib = None


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO_PATH.exists():
        src = _NATIVE_DIR / "batch_sampler.cpp"
        if not src.exists():
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH), str(src), "-lpthread"],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sampler_create.restype = ctypes.c_void_p
    lib.sampler_create.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
    ]
    lib.sampler_destroy.argtypes = [ctypes.c_void_p]
    lib.sampler_has_sky.restype = ctypes.c_int
    lib.sampler_has_sky.argtypes = [ctypes.c_void_p]
    lib.sampler_sample_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, i32p, i64p, f32p, f32p,
    ]
    lib.sampler_sample_sky.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p, i64p]
    lib.sampler_start_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.sampler_next_batch.argtypes = [ctypes.c_void_p, i32p, i64p, f32p, f32p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


class NativeBatchSampler:
    """Owns a native sampler handle over pinned image/mask arrays."""

    def __init__(self, images: np.ndarray, masks: np.ndarray, seed: int = 0):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native batch sampler unavailable (no g++ / .so)")
        self._lib = lib
        c, h, w = images.shape[:3]
        # keep contiguous float32 copies alive for the native side
        self._images = np.ascontiguousarray(images.reshape(c, h * w, 3), np.float32)
        self._masks = np.ascontiguousarray(masks.reshape(c, h * w, 4), np.float32)
        self.num_images, self.height, self.width = c, h, w
        f32p = ctypes.POINTER(ctypes.c_float)
        self._handle = lib.sampler_create(
            self._images.ctypes.data_as(f32p),
            self._masks.ctypes.data_as(f32p),
            c, h, w, seed,
        )
        self._prefetching: Optional[Tuple[int, int]] = None

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.sampler_destroy(self._handle)
            self._handle = None

    @property
    def has_sky(self) -> bool:
        return bool(self._lib.sampler_has_sky(self._handle))

    def _alloc(self, u: int, r: int):
        return (
            np.empty(u, np.int32),
            np.empty(u * r, np.int64),
            np.empty((u * r, 3), np.float32),
            np.empty((u * r, 4), np.float32),
        )

    def sample_batch(self, u: int, r: int):
        rows, pixels, rgb, mask = self._alloc(u, r)
        self._lib.sampler_sample_batch(
            self._handle, u, r,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return rows, pixels, rgb, mask

    def sample_sky(self, n: int):
        rows = np.empty(n, np.int32)
        pixels = np.empty(n, np.int64)
        self._lib.sampler_sample_sky(
            self._handle, n,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return rows, pixels

    def start_prefetch(self, u: int, r: int, queue_depth: int = 4):
        self._lib.sampler_start_prefetch(self._handle, u, r, queue_depth)
        self._prefetching = (u, r)

    def next_batch(self):
        assert self._prefetching, "call start_prefetch first"
        u, r = self._prefetching
        rows, pixels, rgb, mask = self._alloc(u, r)
        self._lib.sampler_next_batch(
            self._handle,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return rows, pixels, rgb, mask
