"""Native (C++) runtime components, with graceful Python fallbacks.

``batch_loader.cpp`` is a dependency-free pthread batch producer bound via
ctypes (no pybind11 in this image).  The shared library is built lazily
with g++ on first use and cached next to the source; if the toolchain or
build is unavailable, callers fall back to the numpy ``BatchLoader``
(data/pipeline.py) — the native path is an overlap/throughput optimization,
not a semantic dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "batch_loader.cpp")
_LIB = os.path.join(_DIR, "_batch_loader.so")

_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library if missing/stale; returns an error string
    on failure, None on success."""
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                _SRC, "-o", _LIB + ".tmp",
            ]
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=120)
            if proc.returncode != 0:
                return f"g++ failed: {proc.stderr[-500:]}"
            os.replace(_LIB + ".tmp", _LIB)
        return None
    except Exception as e:  # missing toolchain, read-only fs, ...
        return f"{type(e).__name__}: {e}"


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_LIB)
        lib.samble_loader_create.restype = ctypes.c_void_p
        lib.samble_loader_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int,
        ]
        lib.samble_loader_num_batches.restype = ctypes.c_int64
        lib.samble_loader_num_batches.argtypes = [ctypes.c_void_p]
        lib.samble_loader_start_epoch.argtypes = [ctypes.c_void_p]
        lib.samble_loader_next.restype = ctypes.c_int
        lib.samble_loader_next.argtypes = [ctypes.c_void_p] + [
            ctypes.c_void_p
        ] * 4
        lib.samble_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native loader library can be built/loaded here."""
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeBatchLoader:
    """Drop-in for ``data.pipeline.BatchLoader`` backed by the C++ producer.

    Same tuple layout per batch: ``(points, label, [seg], valid)``; batch
    composition is equally random but drawn from the native RNG, so batches
    differ from the numpy loader at the same seed (documented — training
    order is not part of the reference contract)."""

    def __init__(
        self,
        pcd: np.ndarray,
        label: np.ndarray,
        seg: Optional[np.ndarray] = None,
        *,
        batch_size: int,
        selected_points: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        queue_depth: int = 3,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        # keep strong refs: the C++ side borrows these buffers
        self.pcd = np.ascontiguousarray(pcd, np.float32)
        self.label = np.ascontiguousarray(label, np.int32)
        self.seg = (
            np.ascontiguousarray(seg, np.int32) if seg is not None else None
        )
        s, n0, c = self.pcd.shape
        self.batch_size = int(batch_size)
        self.selected_points = min(int(selected_points), n0)
        self._c = c
        self._h = lib.samble_loader_create(
            self.pcd.ctypes.data_as(ctypes.c_void_p),
            self.label.ctypes.data_as(ctypes.c_void_p),
            self.seg.ctypes.data_as(ctypes.c_void_p)
            if self.seg is not None
            else None,
            s, n0, c, self.batch_size, self.selected_points,
            int(bool(shuffle)), int(bool(drop_last)), int(seed) & (2**64 - 1),
            int(queue_depth),
        )

    def __len__(self) -> int:
        return int(self._lib.samble_loader_num_batches(self._h))

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        bs, n_sel, c = self.batch_size, self.selected_points, self._c
        self._lib.samble_loader_start_epoch(self._h)
        while True:
            points = np.empty((bs, n_sel, c), np.float32)
            label = np.empty((bs,), np.int32)
            seg = (
                np.empty((bs, n_sel), np.int32)
                if self.seg is not None
                else None
            )
            valid = np.empty((bs,), np.uint8)
            got = self._lib.samble_loader_next(
                self._h,
                points.ctypes.data_as(ctypes.c_void_p),
                label.ctypes.data_as(ctypes.c_void_p),
                seg.ctypes.data_as(ctypes.c_void_p) if seg is not None else None,
                valid.ctypes.data_as(ctypes.c_void_p),
            )
            if not got:
                return
            out = [points, label]
            if seg is not None:
                out.append(seg)
            out.append(valid.astype(bool))
            yield tuple(out)

    def __del__(self):
        lib, h = getattr(self, "_lib", None), getattr(self, "_h", None)
        if lib is not None and h is not None:
            lib.samble_loader_destroy(h)
            self._h = None


def make_train_loader(pcd, label, seg=None, *, batch_size, selected_points,
                      shuffle=True, drop_last=True, seed=0,
                      native: str = "auto"):
    """Training-loader factory: native C++ producer when buildable,
    numpy BatchLoader otherwise (or when ``native='off'``)."""
    from samble_tpu.data.pipeline import BatchLoader

    if native != "off" and available():
        return NativeBatchLoader(
            pcd, label, seg, batch_size=batch_size,
            selected_points=selected_points, shuffle=shuffle,
            drop_last=drop_last, seed=seed,
        )
    if native == "force":
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    return BatchLoader(
        pcd, label, seg, batch_size=batch_size,
        selected_points=selected_points, shuffle=shuffle,
        drop_last=drop_last, seed=seed,
    )
