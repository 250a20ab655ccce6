"""ctypes binding for the native C++ data loader (native/dataloader.cc).

Builds the shared library on first use (g++ -O3, linked against libjpeg/
libpng) and exposes:
  load_batch(paths, size, clip_size) -> (pixel_values, pixel_values_clip)
  preprocess_rgb(array, size, mode)  -> normalized float image

Falls back gracefully: callers should catch NativeLoaderUnavailable and use
the Python pipeline (photoverse_tpu.data.preprocessing).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import List, Tuple

import numpy as np

__all__ = ["NativeLoaderUnavailable", "get_loader", "NativeLoader"]

from photoverse_tpu.data._native_build import NativeBuildError, build_native_lib

_lock = threading.Lock()
_cached = None


class NativeLoaderUnavailable(RuntimeError):
    pass


def _build() -> str:
    try:
        # -ffast-math: the resize convolutions have no NaN/inf semantics
        return build_native_lib(
            "dataloader.cc", "libpvdataloader.so",
            extra_flags=["-ffast-math", "-ljpeg", "-lpng"],
        )
    except NativeBuildError as e:
        raise NativeLoaderUnavailable(str(e)) from e


class NativeLoader:
    def __init__(self, num_threads: int = 0):
        lib = ctypes.CDLL(_build())
        lib.pv_load_batch.restype = ctypes.c_int
        lib.pv_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.pv_load_batch_masked.restype = ctypes.c_int
        lib.pv_load_batch_masked.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.pv_preprocess_rgb.restype = None
        lib.pv_preprocess_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        self._lib = lib
        self.requested_threads = num_threads
        self.num_threads = num_threads or (os.cpu_count() or 4)

    def load_batch(
        self, paths: List[str], size: int = 512, clip_size: int = 224
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(paths)
        pv = np.empty((n, size, size, 3), np.float32)
        pc = np.empty((n, clip_size, clip_size, 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        ok = self._lib.pv_load_batch(
            arr, n, size, clip_size, min(self.num_threads, n),
            pv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if ok != n:
            raise IOError(f"native loader decoded {ok}/{n} images")
        return pv, pc

    def load_batch_masked(
        self,
        paths: List[str],
        mask_paths: List[str],
        size: int = 512,
        clip_size: int = 224,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """CustomDatasetWithMasks pipeline: pixel_values from the raw image,
        pixel_values_clip from the background-zeroed face crop."""
        n = len(paths)
        assert len(mask_paths) == n
        pv = np.empty((n, size, size, 3), np.float32)
        pc = np.empty((n, clip_size, clip_size, 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        marr = (ctypes.c_char_p * n)(*[p.encode() for p in mask_paths])
        ok = self._lib.pv_load_batch_masked(
            arr, marr, n, size, clip_size, min(self.num_threads, n),
            pv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if ok != n:
            raise IOError(f"native loader decoded {ok}/{n} image/mask pairs")
        return pv, pc

    def preprocess_rgb(
        self, image: np.ndarray, size: int, mode: str = "vae"
    ) -> np.ndarray:
        """(H, W, 3) uint8 -> (size, size, 3) float; mode 'vae' ([-1,1]) or
        'clip' (CLIP mean/std)."""
        img = np.ascontiguousarray(image, np.uint8)
        h, w = img.shape[:2]
        out = np.empty((size, size, 3), np.float32)
        self._lib.pv_preprocess_rgb(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, size, 0 if mode == "vae" else 1,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out


def get_loader(num_threads: int = 0) -> NativeLoader:
    """Cached per thread count — a warmup call with the default must not pin
    a later --dataloader_num_workers choice to the first value seen."""
    global _cached
    with _lock:
        if _cached is None or _cached.requested_threads != num_threads:
            _cached = NativeLoader(num_threads)
        return _cached
