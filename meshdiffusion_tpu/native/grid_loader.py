"""ctypes binding + build driver for the native grid loader.

The C++ library (grid_loader.cpp) replaces the Python hot path of the
training data feed (npy decode, SDF sign-normalize, deform jitter, mask
multiply, pad, channels-last batch assembly — reference
shapenet_dmtet_dataset.py:32-54 behavior) with a persistent thread pool
writing straight into a reusable pinned numpy batch buffer.

Built on demand with g++ (no pybind11 dependency); falls back gracefully —
callers should check ``native_available()`` and use the Python
ShapeNetDMTetDataset otherwise.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), 'grid_loader.cpp')
_LIB = os.path.join(os.path.dirname(__file__), 'libgrid_loader.so')
_lib_handle = None


def build_native(force: bool = False) -> Optional[str]:
    """Compile grid_loader.cpp -> libgrid_loader.so. Returns path or None."""
    if os.path.exists(_LIB) and not force \
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
           _SRC, '-o', _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning('native grid loader build failed: %s',
                       getattr(e, 'stderr', e))
        return None


def _load_lib():
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.grid_loader_create.restype = ctypes.c_void_p
    lib.grid_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.grid_loader_fill.restype = ctypes.c_int
    lib.grid_loader_fill.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.grid_loader_last_error.restype = ctypes.c_char_p
    lib.grid_loader_last_error.argtypes = [ctypes.c_void_p]
    lib.grid_loader_destroy.restype = None
    lib.grid_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib_handle = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeGridLoader:
    """Shuffling epoch-wrapping batch iterator backed by the C++ pool.

    Drop-in for data.dataset.GridLoader for .npy datasets: yields
    (B, R, R, R, 4) float32 channels-last batches forever.
    """

    def __init__(self, paths: Sequence[str], grid_mask: np.ndarray,
                 batch_size: int, aug: bool = True,
                 normalize_sdf: bool = True, num_workers: int = 4,
                 seed: int = 0):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError('native grid loader unavailable (g++ build failed)')
        bad = [p for p in paths if not p.endswith('.npy')]
        if bad:
            raise ValueError(f'.npy only; got {bad[:3]}')
        self._lib = lib
        self.paths = list(paths)
        self.batch_size = batch_size
        gm = np.ascontiguousarray(np.asarray(grid_mask, np.float32)
                                  .reshape(-1))
        self.resolution = int(round(len(gm) ** (1 / 3)))
        assert self.resolution ** 3 == len(gm), 'mask must be R^3'

        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in self.paths])
        self._handle = lib.grid_loader_create(
            arr, len(paths), gm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.resolution, int(aug), int(normalize_sdf),
            ctypes.c_uint64(seed), num_workers)
        self._rng = np.random.default_rng(seed)
        self._perm: List[int] = []
        R = self.resolution
        self._buf = np.empty((batch_size, R, R, R, 4), np.float32)

    def _next_indices(self) -> np.ndarray:
        while len(self._perm) < self.batch_size:
            self._perm.extend(self._rng.permutation(len(self.paths)).tolist())
        idx = self._perm[:self.batch_size]
        del self._perm[:self.batch_size]
        return np.asarray(idx, np.int64)

    def load_indices(self, indices: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(np.asarray(indices, np.int64))
        rc = self._lib.grid_loader_fill(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            err = self._lib.grid_loader_last_error(self._handle)
            raise RuntimeError(f'native loader: {err.decode()}')
        return self._buf[:len(idx)].copy()

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        return self.load_indices(self._next_indices())

    def close(self):
        if self._handle:
            self._lib.grid_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
