"""ctypes binding for the native measurement decoder.

Compiles `data/native/hdr_decoder.cpp` on first use (g++ -O3 -fopenmp
-shared) into a cached .so; falls back to the Python/cv2 path in
`data/preprocess.py` if the toolchain or decode fails.  This replaces the
role of the reference's 8 DataLoader worker processes doing cv2 decode
(`train.py:121-122`, `utils/nlos_pose_dataloader.py:76-119`) with one
OpenMP-parallel native pass.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "native", "hdr_decoder.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "_hdr_decoder.so")


def _build() -> Optional[ctypes.CDLL]:
    global _FAILED
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            cmd = [
                "g++", "-O3", "-march=native", "-fopenmp", "-shared",
                "-fPIC", _SRC, "-o", _SO,
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.hdr_decode_gray.restype = ctypes.c_int
        lib.hdr_decode_gray.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_long,
        ]
        lib.preprocess_meas.restype = ctypes.c_int
        lib.preprocess_meas.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        return lib
    except Exception:
        _FAILED = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _FAILED:
        with _LOCK:
            if _LIB is None and not _FAILED:
                _LIB = _build()
    return _LIB


def available() -> bool:
    return get_lib() is not None


def decode_hdr_gray_native(path: str,
                           max_pixels: int = 600 * 256 * 256) -> np.ndarray:
    """Native decode+gray+/max; raises on failure (caller falls back)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    buf = np.empty(max_pixels, dtype=np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.hdr_decode_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h), ctypes.byref(w), buf.size,
    )
    if rc != 0:
        raise ValueError(f"native hdr decode failed rc={rc} for {path}")
    return buf[: h.value * w.value].reshape(h.value, w.value)


def preprocess_meas_native(
    gray: np.ndarray, t_frames: int = 600, crop: int = 512,
    downsample_cnt: int = 1,
) -> np.ndarray:
    """Native fused crop + pair-average + downsample.

    gray: (t_frames*h, w) float32 → ((crop/2) >> ds, h >> ds, w >> ds).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    th, w = gray.shape
    h = th // t_frames
    ds = downsample_cnt
    out = np.empty(((crop // 2) >> ds, h >> ds, w >> ds), dtype=np.float32)
    gray = np.ascontiguousarray(gray, dtype=np.float32)
    rc = lib.preprocess_meas(
        gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_frames, h, w, crop, ds,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"native preprocess failed rc={rc}")
    return out


def load_measurement(
    path: str, t_frames: int = 600, crop: int = 512, downsample_cnt: int = 1
) -> np.ndarray:
    """decode + preprocess with automatic Python fallback."""
    try:
        gray = decode_hdr_gray_native(path)
        return preprocess_meas_native(gray, t_frames, crop, downsample_cnt)
    except Exception:
        from hiddenpose_tpu.data import preprocess as pp

        gray = pp.decode_hdr_gray(path)
        return pp.preprocess_measurement(
            gray, downsample_cnt, t=t_frames, crop=crop
        )
