"""ctypes bindings for the native host runtime (loader.cc).

Builds ``libmsf_runtime.so`` on first use (g++ -O3) and exposes:
* ``preprocess_scan``      — C++ ingest (invalid removal, azimuth rel-time
                             unwrap, ring-image packing), same semantics as
                             ``dataio.preprocess`` (golden-tested against it)
* ``read_kitti_bin``       — raw .bin reader
* ``Prefetcher``           — threaded read-ahead over a KITTI velodyne dir

Falls back cleanly: ``available()`` is False if no compiler / build failure,
and callers keep the numpy path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("msf_loam_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")
_SO = os.path.join(_HERE, "libmsf_runtime.so")

_lib = None
_lock = threading.Lock()


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        logger.warning("native runtime build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.msf_preprocess_scan.restype = ctypes.c_int
        lib.msf_preprocess_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.msf_read_kitti_bin.restype = ctypes.c_int
        lib.msf_read_kitti_bin.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int]
        lib.msf_prefetcher_create.restype = ctypes.c_void_p
        lib.msf_prefetcher_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int]
        lib.msf_prefetcher_next.restype = ctypes.c_int
        lib.msf_prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.msf_prefetcher_destroy.restype = None
        lib.msf_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def preprocess_scan(xyz: np.ndarray, ring: Optional[np.ndarray],
                    min_range: float, scan_period: float, n_rings: int,
                    width: int, fov_up: float = 2.0, fov_down: float = -24.8
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """C++ ingest. Returns (xyz (R,W,3), rel_time (R,W), mask (R,W), kept)."""
    lib = _load()
    assert lib is not None, "native runtime unavailable"
    xyz = np.ascontiguousarray(xyz, np.float32)
    ring_ptr = None
    if ring is not None:
        ring = np.ascontiguousarray(ring, np.int32)
        ring_ptr = ring.ctypes.data_as(ctypes.c_void_p)
    out_xyz = np.zeros((n_rings, width, 3), np.float32)
    out_rel = np.zeros((n_rings, width), np.float32)
    out_mask = np.zeros((n_rings, width), np.uint8)
    kept = lib.msf_preprocess_scan(
        xyz.ctypes.data_as(ctypes.c_void_p), ring_ptr, xyz.shape[0],
        min_range, scan_period, n_rings, width, fov_up, fov_down,
        out_xyz.ctypes.data_as(ctypes.c_void_p),
        out_rel.ctypes.data_as(ctypes.c_void_p),
        out_mask.ctypes.data_as(ctypes.c_void_p))
    return out_xyz, out_rel, out_mask.astype(bool), kept


def read_kitti_bin(path: str, max_points: int = 200_000) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native runtime unavailable"
    buf = np.zeros((max_points, 4), np.float32)
    n = lib.msf_read_kitti_bin(path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
                               max_points)
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:n]


class Prefetcher:
    """Threaded read-ahead over <dir>/000000.bin.. (in-order delivery)."""

    def __init__(self, velodyne_dir: str, n_frames: int, n_rings: int,
                 width: int, min_range: float = 0.3, scan_period: float = 0.1,
                 fov_up: float = 2.0, fov_down: float = -24.8,
                 n_threads: int = 2):
        lib = _load()
        assert lib is not None, "native runtime unavailable"
        self._lib = lib
        self.n_rings, self.width = n_rings, width
        self._h = lib.msf_prefetcher_create(
            velodyne_dir.encode(), n_frames, n_rings, width, min_range,
            scan_period, fov_up, fov_down, n_threads)

    def __iter__(self):
        return self

    def __next__(self):
        out_xyz = np.zeros((self.n_rings, self.width, 3), np.float32)
        out_rel = np.zeros((self.n_rings, self.width), np.float32)
        out_mask = np.zeros((self.n_rings, self.width), np.uint8)
        n_kept = ctypes.c_int(0)
        idx = self._lib.msf_prefetcher_next(
            self._h, out_xyz.ctypes.data_as(ctypes.c_void_p),
            out_rel.ctypes.data_as(ctypes.c_void_p),
            out_mask.ctypes.data_as(ctypes.c_void_p), ctypes.byref(n_kept))
        if idx < 0:
            raise StopIteration
        return idx, out_xyz, out_rel, out_mask.astype(bool), n_kept.value

    def close(self):
        if self._h:
            self._lib.msf_prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
