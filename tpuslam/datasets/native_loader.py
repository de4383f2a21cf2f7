"""ctypes binding for the native prefetching image loader.

The reference decodes each frame with cv::imread inline in the dataset
main loop (/root/reference/Examples/Monocular/mono_euroc.cc:124-132);
here decode runs in C++ worker threads AHEAD of the tracker so PNG
inflation overlaps TPU compute (native/loader.cpp). Falls back to
PIL when the shared library has not been built (`make -C native`) —
same pixels, just synchronous.

Usage:
    with PrefetchingLoader(paths, w, h) as ld:
        for i in range(len(paths)):
            img = ld[i]          # (h, w) float32, [0, 255]
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_SO = Path(__file__).resolve().parents[2] / "native" / "libtpuslam_io.so"
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.tsl_open.restype = ctypes.c_void_p
    lib.tsl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                             ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int]
    lib.tsl_next.restype = ctypes.c_int
    lib.tsl_next.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.tsl_close.restype = None
    lib.tsl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def build_native() -> bool:
    """Build the shared library in-tree (g++ is part of the image)."""
    import subprocess
    root = _SO.parent
    try:
        subprocess.run(["make", "-C", str(root)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return _SO.exists()


class PrefetchingLoader:
    """Ordered frame delivery with native decode-ahead.

    Frames must be consumed sequentially (index 0, 1, 2, ...) — the SLAM
    access pattern. `workers` decode threads stay `depth` frames ahead.
    """

    def __init__(self, paths, width: int, height: int, workers: int = 2,
                 depth: int = 8, force_fallback: bool = False):
        self.paths = [str(p) for p in paths]
        self.w, self.h = int(width), int(height)
        self._handle = None
        self._lib = None if force_fallback else _load_lib()
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = self._lib.tsl_open(
                arr, len(self.paths), self.w, self.h, workers, depth)
            if not self._handle:
                self._lib = None

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._handle:
            out = np.empty((self.h, self.w), np.float32)
            rc = self._lib.tsl_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                int(idx))
            if rc == 0:
                return out
            # Native decode failed (size mismatch, bad file): fall
            # through to PIL for a readable error.
        from PIL import Image
        img = np.asarray(Image.open(self.paths[idx]).convert("L"),
                         np.float32)
        if img.shape != (self.h, self.w):
            raise ValueError(
                f"{self.paths[idx]}: got {img.shape}, want "
                f"({self.h}, {self.w})")
        return img

    def close(self):
        if self._handle:
            self._lib.tsl_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
