"""Measurement preprocessing primitives (host-side NumPy).

The deterministic transforms shared by every data source, re-designed from
the reference's inline dataloader code:

* hdr decode + grayscale + max-normalise
  (`utils/nlos_pose_dataloader.py:76-107`)
* stacked-frame unpacking and pair-average rebinning (:109-119)
* noise injection: 1D Gaussian temporal blur + Poisson shot noise
  (`utils/nlos_pose_dataloader_noise.py:93,167-172`)
* joint coordinate mapping to heatmap-voxel units (:132-144)
* real-capture loading (`utils/loadrealdata.py:6-15`) and the fk-capture
  re-binning path (`test.py:150-155`)
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def decode_hdr_gray(path: str) -> np.ndarray:
    """Read an .hdr measurement, BGR→gray, /max twice as the reference does
    (`utils/nlos_pose_dataloader.py:85-87`).  Raises on unreadable or black
    files (caller handles the fallback policy)."""
    import cv2

    img = cv2.imread(path, -1)
    if img is None:
        raise IOError(f"unreadable measurement {path}")
    if abs(float(np.max(img))) < 1e-10:
        raise ValueError(f"black measurement {path}")
    img = img / np.max(img)
    gray = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_BGR2GRAY)
    return gray / np.max(gray)


def add_noise(gray: np.ndarray, sigma: float = 10.61,
              rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Temporal jitter + shot noise on the raw stacked-frame image.

    Matches `utils/nlos_pose_dataloader_noise.py:167-172`: flatten, 1D
    Gaussian blur (sigma = 25-bin FWHM / 2.355, replicate border), Poisson
    sample, then the caller re-normalises by max."""
    import cv2

    flat = np.ascontiguousarray(gray.reshape(-1).astype(np.float32))
    blurred = cv2.GaussianBlur(
        flat, ksize=(0, 0), sigmaX=sigma, borderType=cv2.BORDER_REPLICATE
    ).reshape(-1)
    lam = np.clip(blurred, 0.0, None)
    rng = rng or np.random
    noised = rng.poisson(lam).astype(np.float32)
    return noised.reshape(gray.shape)


def unpack_frames(gray: np.ndarray, t: int = 600, crop: int = 512) -> np.ndarray:
    """(t*h, w) stacked frames → (crop, h, w) (`nlos_pose_dataloader.py:109`)."""
    th, w = gray.shape
    h = th // t
    return gray.reshape(t, h, w)[:crop]


def rebin_pairs(x: np.ndarray, axis: int) -> np.ndarray:
    """Average adjacent pairs along an axis ((a[::2]+a[1::2])/2)."""
    sl0 = [slice(None)] * x.ndim
    sl1 = [slice(None)] * x.ndim
    sl0[axis] = slice(0, None, 2)
    sl1[axis] = slice(1, None, 2)
    return (x[tuple(sl0)] + x[tuple(sl1)]) / 2


def downsample_volume(x: np.ndarray, count: int) -> np.ndarray:
    """Halve all three axes `count` times (`nlos_pose_dataloader.py:116-123`)."""
    for _ in range(count):
        for axis in range(x.ndim):
            x = rebin_pairs(x, axis)
    return x


def preprocess_measurement(
    gray: np.ndarray, downsample_cnt: int = 1, t: int = 600, crop: int = 512
) -> np.ndarray:
    """Full meas path: unpack → temporal pair-avg (512→256) → /2 on all axes
    per downsample_cnt.  Default yields (128, 128, 128)."""
    meas = unpack_frames(gray, t=t, crop=crop)
    meas = rebin_pairs(meas, axis=0)
    return downsample_volume(meas, downsample_cnt)


def map_joints_to_heatmap(
    joints: np.ndarray,
    vol_size: int = 256,
    heatmap_size: int = 64,
) -> np.ndarray:
    """SMPL joints in normalised scene coords → heatmap-voxel (d, h, w).

    Matches `utils/nlos_pose_dataloader.py:132-144`: affine map to the
    256-voxel grid (x·128+128, 256−(y·128+128), 225−(z·128+128)), permute
    (x, y, z)→(d, h, w), divide by vol/heatmap ratio."""
    j = np.asarray(joints, dtype=np.float64).copy()
    x = j[:, 0] * 128 + 128
    y = 256 - (j[:, 1] * 128 + 128)
    z = 225 - (j[:, 2] * 128 + 128)
    out = np.stack([z, y, x], axis=1)  # (d, h, w)
    return (out / (vol_size / heatmap_size)).astype(np.float32)


def load_realdata(path: str, downsample_cnt: int = 1) -> np.ndarray:
    """Measured capture: .mat['data_new'] (h, w, t) → (t, w, h), temporal
    pair-avg, then /2 on all axes per count (`utils/loadrealdata.py:6-15`)."""
    from scipy.io import loadmat

    meas = np.transpose(loadmat(path)["data_new"], (2, 1, 0)).astype(np.float32)
    meas = rebin_pairs(meas, axis=0)
    return downsample_volume(meas, downsample_cnt)


def load_fk_measurement(path: str, rebin_count: int = 2,
                        time_crop: Tuple[int, int] = (64, 192)) -> np.ndarray:
    """fk-dataset capture: .mat['meas'] (h, w, t); temporal pair-avg x
    rebin_count, centre time-crop, → (t, h, w) (`test.py:147-154`)."""
    from scipy.io import loadmat

    meas = loadmat(path)["meas"].astype(np.float32)
    for _ in range(rebin_count):
        meas = rebin_pairs(meas, axis=2)
    meas = meas[:, :, time_crop[0]:time_crop[1]]
    return np.transpose(meas, (2, 0, 1))


def load_vol_mat(path: str) -> np.ndarray:
    from scipy.io import loadmat

    return loadmat(path)["vol"].astype(np.float32)
