"""Native (C++) batch loader: threaded libjpeg/libpng decode + staging resize.

The reference delegates image IO to torch DataLoader worker *processes*
(train.py:507-512); here a ctypes-loaded C++ extension decodes whole batches
on a std::thread pool with the GIL released, writing directly into numpy
buffers.  Compiled on first use with g++ (cached beside the source); callers
fall back to the PIL path when the toolchain or codecs are unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")
_SO = os.path.join(_HERE, "_fastloader.so")
_lock = threading.Lock()
_lib = None
_unavailable_reason: Optional[str] = None


def _build() -> str:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, _SRC,
           "-ljpeg", "-lpng", "-pthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_lib():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _unavailable_reason
    with _lock:
        if _lib is not None or _unavailable_reason is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.fill_batch.restype = ctypes.c_int
            lib.fill_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            _unavailable_reason = f"{type(e).__name__}: {e}"
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def unavailable_reason() -> Optional[str]:
    get_lib()
    return _unavailable_reason


def default_threads() -> int:
    """2 threads per core (decode overlaps file IO), capped at 8 — measured
    best on the single-core CI host (oversubscription degrades throughput)."""
    return max(2, min(8, (os.cpu_count() or 1) * 2))


def load_batch(jpg_paths: Sequence[str], png_paths: Optional[Sequence[str]],
               stage_hw, num_threads: Optional[int] = None,
               mask_cache: bool = True, planar: bool = False):
    """Decode a batch of (jpeg, png-mask) pairs into fresh numpy arrays.

    Returns (images (N, H, W, 3) uint8 — or (N, 3, H, W) with ``planar``,
    the layout the pallas warp backend consumes without an on-device
    transpose — labels (N, H, W) uint8, n_failures).
    ``png_paths=None`` skips masks (labels returned zeroed).
    ``mask_cache``: write/read uncompressed ``<png>.rawmask`` sidecars —
    PNG inflate dominates mask decode on small hosts (docs/ROADMAP.md),
    so epochs after the first skip it.  Best-effort: read-only dataset
    directories silently fall back to PNG decode every time.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_unavailable_reason}")
    if num_threads is None:
        num_threads = default_threads()
    n = len(jpg_paths)
    h, w = stage_hw
    imgs = np.empty((n, 3, h, w) if planar else (n, h, w, 3), np.uint8)
    lbls = np.zeros((n, h, w), np.uint8)
    jarr = (ctypes.c_char_p * n)(*[p.encode() for p in jpg_paths])
    if png_paths is None:
        parr = ctypes.cast(None, ctypes.POINTER(ctypes.c_char_p))
    else:
        parr = (ctypes.c_char_p * n)(*[p.encode() for p in png_paths])
    failures = lib.fill_batch(
        jarr, parr, n,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lbls.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, num_threads, int(mask_cache), int(planar))
    return imgs, lbls, int(failures)
