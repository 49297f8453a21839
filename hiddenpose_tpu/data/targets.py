"""Supervision target generators for the alternate coordinate
representations ('sa-simdr', '2DHeatmap', '3DHeatmap-gaussian').

Re-designs, vectorised over joints (the reference loops per joint):
* :func:`generate_sa_simdr` — per-axis 1D Gaussian classification targets
  (`utils/dataloader.py:236-290`), normalised by 1/(σ√2π), with the
  out-of-bounds visibility zeroing of `adjust_target_weight`
  (`utils/dataloader.py:221-234`).
* :func:`generate_gaussian_heatmap_2d` — per-joint 2D Gaussian maps
  (`utils/criterion.py:179-225`, `utils/generate_target.py:5-68` — the
  latter's buggy indexing at :62 is *not* reproduced).
* :func:`generate_gaussian_heatmap_3d` — 3D analogue
  (`utils/dataloader.py:27-81` GetHeatmap.generate_target_3d).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _oob_weight(mu: np.ndarray, dims: np.ndarray, tmp: float) -> np.ndarray:
    """Zero the weight when no part of the Gaussian is in-bounds."""
    ul = np.floor(mu - tmp)
    br = np.floor(mu + tmp + 1)
    oob = (ul >= dims[None, :]).any(axis=1) | (br < 0).any(axis=1)
    return (~oob).astype(np.float32)


def generate_sa_simdr(
    joints: np.ndarray,
    joints_vis: Optional[np.ndarray] = None,
    image_size: Tuple[int, int, int] = (64, 64, 128),
    split_ratio: float = 2.0,
    sigma: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(J, 3) joints → per-axis targets (J, dim*k) + weights (J, 1)."""
    j = np.asarray(joints, np.float64)
    n = j.shape[0]
    vis = np.ones((n, 3)) if joints_vis is None else np.asarray(joints_vis)
    dims = np.asarray([int(d * split_ratio) for d in image_size])

    w = vis[:, 0].astype(np.float32)
    w = w * _oob_weight(j, dims, sigma * 3)

    norm = 1.0 / (sigma * np.sqrt(2 * np.pi))
    outs = []
    for ax in range(3):
        grid = np.arange(dims[ax], dtype=np.float64)
        mu = j[:, ax:ax + 1] * split_ratio
        t = norm * np.exp(-((grid[None, :] - mu) ** 2) / (2 * sigma ** 2))
        t = t * (w[:, None] > 0.5)
        outs.append(t.astype(np.float32))
    return outs[0], outs[1], outs[2], w.reshape(n, 1)


def generate_gaussian_heatmap_2d(
    joints: np.ndarray,
    joints_vis: Optional[np.ndarray] = None,
    heatmap_size: Tuple[int, int] = (64, 64),
    sigma: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(J, >=2) joints → (J, H, W) Gaussian maps + (J, 1) weights."""
    j = np.asarray(joints, np.float64)
    n = j.shape[0]
    vis = np.ones((n, 3)) if joints_vis is None else np.asarray(joints_vis)
    dims = np.asarray(heatmap_size[::-1])  # (w, h) bound order follows x, y

    w = vis[:, 0].astype(np.float32)
    w = w * _oob_weight(j[:, :2], dims, sigma * 3)

    xs = np.arange(heatmap_size[1], dtype=np.float64)
    ys = np.arange(heatmap_size[0], dtype=np.float64)
    gx = np.exp(-((xs[None, :] - j[:, 0:1]) ** 2) / (2 * sigma ** 2))
    gy = np.exp(-((ys[None, :] - j[:, 1:2]) ** 2) / (2 * sigma ** 2))
    target = gy[:, :, None] * gx[:, None, :]
    target = target * (w[:, None, None] > 0.5)
    return target.astype(np.float32), w.reshape(n, 1)


def generate_gaussian_heatmap_3d(
    joints: np.ndarray,
    joints_vis: Optional[np.ndarray] = None,
    heatmap_size: Tuple[int, int, int] = (64, 64, 64),
    sigma: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(J, 3) joints in (d, h, w) voxel coords → (J, D, H, W) Gaussians."""
    j = np.asarray(joints, np.float64)
    n = j.shape[0]
    vis = np.ones((n, 3)) if joints_vis is None else np.asarray(joints_vis)
    dims = np.asarray(heatmap_size)

    w = vis[:, 0].astype(np.float32)
    w = w * _oob_weight(j, dims, sigma * 3)

    grids = [np.arange(d, dtype=np.float64) for d in heatmap_size]
    g = [
        np.exp(-((grids[ax][None, :] - j[:, ax:ax + 1]) ** 2) / (2 * sigma ** 2))
        for ax in range(3)
    ]
    target = g[0][:, :, None, None] * g[1][:, None, :, None] * g[2][:, None, None, :]
    target = target * (w[:, None, None, None] > 0.5)
    return target.astype(np.float32), w.reshape(n, 1)
