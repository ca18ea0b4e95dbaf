"""ctypes binding for the native C++ data runtime (native/ott_dataio.cpp).

The reference consumes its native layer over a ctypes C ABI
(/root/reference/models_detection/YOLO.py:58-119 binds libdarknet.so for
image IO + NMS). This module is the TPU framework's equivalent boundary:
`libottdata.so` does the host-bound byte work — JPEG/PNG decode, fused
bilinear-resize+normalize, batch loading with a worker pool, and the
reference-semantics greedy NMS — while all device work stays in JAX.

The library is built on demand from `native/` with the repo Makefile and
cached next to the sources; every entry point degrades gracefully (returns
None / raises ImportError) so the pure-Python cv2 path remains a fallback
and tests can run without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_ABI_VERSION = 4

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    f32_p = ctypes.POINTER(ctypes.c_float)
    i32_p = ctypes.POINTER(ctypes.c_int)
    lib.ott_version.restype = ctypes.c_int
    lib.ott_load_image_f32.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.c_int, f32_p]
    lib.ott_load_image_f32.restype = ctypes.c_int
    lib.ott_image_size.argtypes = [ctypes.c_char_p, i32_p, i32_p]
    lib.ott_image_size.restype = ctypes.c_int
    lib.ott_load_batch_f32.argtypes = [c_char_pp, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int, f32_p,
                                       ctypes.c_int]
    lib.ott_load_batch_f32.restype = ctypes.c_int
    u8_p = ctypes.POINTER(ctypes.c_uint8)
    lib.ott_load_batch_u8.argtypes = [c_char_pp, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, u8_p,
                                      ctypes.c_int]
    lib.ott_load_batch_u8.restype = ctypes.c_int
    lib.ott_nms_scores.argtypes = [f32_p, f32_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_float]
    lib.ott_nms_scores.restype = None
    return lib


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) libottdata.so. None if unavailable."""
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        so = os.path.join(_NATIVE_DIR, 'libottdata.so')
        src = os.path.join(_NATIVE_DIR, 'ott_dataio.cpp')
        try:
            stale = (not os.path.exists(so)
                     or (os.path.exists(src)
                         and os.path.getmtime(src) > os.path.getmtime(so)))
            if stale and build:
                if not os.path.exists(src):
                    raise FileNotFoundError(src)
                subprocess.run(['make', '-s'], cwd=_NATIVE_DIR, check=True,
                               capture_output=True, timeout=300)
            lib = _bind(ctypes.CDLL(so))
            if lib.ott_version() != _ABI_VERSION:
                # Stale binary from an older source revision: rebuild once.
                # The Makefile builds to a temp file and renames, so the
                # rebuilt .so has a fresh inode and this second CDLL maps
                # the new code rather than deduping to the stale handle.
                subprocess.run(['make', '-s', 'clean'], cwd=_NATIVE_DIR,
                               check=True, capture_output=True)
                subprocess.run(['make', '-s'], cwd=_NATIVE_DIR, check=True,
                               capture_output=True, timeout=300)
                lib = _bind(ctypes.CDLL(so))
                if lib.ott_version() != _ABI_VERSION:
                    # Still stale (e.g. the old mapping won) — refuse to
                    # use a wrong-ABI library silently.
                    _build_failed = True
                    return None
            _lib = lib
        except Exception:
            _build_failed = True
            return None
        return _lib


def available() -> bool:
    return load_library() is not None


def load_image(path: str, net_h: int, net_w: int) -> np.ndarray:
    """One file → (net_h, net_w, 3) float32 RGB in [0, 1]."""
    lib = load_library()
    if lib is None:
        raise ImportError('libottdata.so unavailable')
    out = np.empty((net_h, net_w, 3), np.float32)
    rc = lib.ott_load_image_f32(
        path.encode(), net_h, net_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise FileNotFoundError(f'native decode failed ({rc}): {path}')
    return out


def image_size(path: str) -> tuple[int, int]:
    """Decode only the header → (height, width)."""
    lib = load_library()
    if lib is None:
        raise ImportError('libottdata.so unavailable')
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.ott_image_size(path.encode(), ctypes.byref(h),
                            ctypes.byref(w))
    if rc != 0:
        raise FileNotFoundError(f'native header decode failed: {path}')
    return h.value, w.value


def load_batch(paths: Sequence[str], net_h: int, net_w: int,
               n_threads: int = 0) -> np.ndarray:
    """N files → (N, net_h, net_w, 3) float32; raises if any file fails."""
    lib = load_library()
    if lib is None:
        raise ImportError('libottdata.so unavailable')
    n = len(paths)
    out = np.empty((n, net_h, net_w, 3), np.float32)
    if n == 0:
        return out
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.ott_load_batch_f32(
        arr, n, net_h, net_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if failed:
        raise FileNotFoundError(
            f'native decode failed for {failed}/{n} images')
    return out


def load_batch_u8(paths: Sequence[str], net_h: int, net_w: int,
                  n_threads: int = 0) -> np.ndarray:
    """N files → (N, net_h, net_w, 3) uint8 RGB, resized but NOT
    normalized — the device-resident train path's host decode: uint8
    ships 4x less data host→HBM and the /255 happens on device, fused
    into the first conv (see training/steps.py fused steps)."""
    lib = load_library()
    if lib is None:
        raise ImportError('libottdata.so unavailable')
    n = len(paths)
    out = np.empty((n, net_h, net_w, 3), np.uint8)
    if n == 0:
        return out
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.ott_load_batch_u8(
        arr, n, net_h, net_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    if failed:
        raise FileNotFoundError(
            f'native decode failed for {failed}/{n} images')
    return out


def nms_scores(boxes: np.ndarray, scores: np.ndarray,
               nms_threshold: float = 0.45) -> np.ndarray:
    """Host-side greedy per-class NMS (reference utils.py:239-252 / darknet
    do_nms_obj semantics). boxes (N,4) center-format; scores (N,C).
    Returns a new suppressed score array."""
    lib = load_library()
    if lib is None:
        raise ImportError('libottdata.so unavailable')
    boxes = np.ascontiguousarray(boxes, np.float32)
    out = np.ascontiguousarray(scores, np.float32).copy()
    lib.ott_nms_scores(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        boxes.shape[0], out.shape[1], float(nms_threshold))
    return out


def make_loader(net_h: int, net_w: int
                ) -> Optional[Callable[[str], np.ndarray]]:
    """A per-path loader callable compatible with generators'
    `loader=` argument, or None if the native library is unavailable."""
    if not available():
        return None

    def load(path: str) -> np.ndarray:
        return load_image(path, net_h, net_w)

    return load


# NOTE: batch prefetch/double-buffering lives in the fit loop
# (training/loop.py::_prefetch runs the whole batch pipeline — including
# these GIL-releasing C decodes — in a background queue, the
# framework-native replacement for Keras fit_generator's
# max_queue_size=3 worker pool, reference BaseTracker.py:112). An
# earlier per-loader PrefetchingBatchLoader class here duplicated that
# and was never wired in; it was removed (VERDICT r4).
