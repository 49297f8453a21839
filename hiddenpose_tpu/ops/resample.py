"""Multi-view volume re-rendering (grid rotation + trilinear sampling).

Re-design of the reference's optional 26-view resampler
(`/root/reference/models/tfmodule.py:19-119` `diffmodule.initgrid/forward`
+ `utils/init_mats.py:114-213`):

* :func:`view_rotations` derives the 26 view matrices analytically
  (identity + 25 Fibonacci-sphere directions, Rodrigues rotation from the
  z-axis) — the reference hardcodes the same values and checks them against
  this construction (`init_mats.py:211`); no cv2 needed.
* :func:`grid_sample_3d` is torch ``F.grid_sample(mode='bilinear',
  padding_mode='zeros')`` for volumes, on `jax.scipy.ndimage.map_coordinates`.
* :class:`MultiViewResampler` applies the z-crop grid then per-view rotated
  grids exactly as `tfmodule.py:105-119` does (the `rev` sign-flips become a
  diag(1,-1,-1) conjugation of the rotation).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _rodrigues(axis: np.ndarray, theta: float) -> np.ndarray:
    a = axis / np.linalg.norm(axis)
    K = np.array([
        [0, -a[2], a[1]],
        [a[2], 0, -a[0]],
        [-a[1], a[0], 0],
    ])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def view_rotations(trans: bool = False) -> np.ndarray:
    """(26, 3, 3) float32: identity + 25 Fibonacci-sphere view rotations
    (matches `utils/init_mats.py:173-209`)."""
    mats = [np.eye(3)]
    samplenum = 25
    ratio = 0.5
    sam2 = int(samplenum / ratio / ratio)
    sambe = sam2 - samplenum
    phi = (np.sqrt(5.0) - 1.0) / 2.0
    for i in range(samplenum):
        n = sambe + i + 1.0
        N = sam2 + 1.0
        zn = n / N
        r = np.sqrt(1 - zn * zn)
        angle = 2.0 * np.pi * n * phi
        new_axis = np.array([r * np.cos(angle), r * np.sin(angle), zn])
        rot_axis = np.cross([0.0, 0.0, 1.0], new_axis)
        theta = np.arccos(zn)
        m = _rodrigues(rot_axis, theta)
        mats.append(m.T if trans else m)
    return np.asarray(mats, dtype=np.float32)


def _normalized_grid(d: int, h: int, w: int, align_corners: bool) -> np.ndarray:
    """(D, H, W, 3) grid of (x, y, z) coords in [-1, 1] (affine_grid with
    identity theta)."""
    def axis(n):
        if align_corners:
            return np.linspace(-1.0, 1.0, n, dtype=np.float64)
        return (2 * np.arange(n, dtype=np.float64) + 1) / n - 1

    z, y, x = np.meshgrid(axis(d), axis(h), axis(w), indexing="ij")
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def grid_sample_3d(
    vol: jax.Array, grid: jax.Array, align_corners: bool = False
) -> jax.Array:
    """vol (B, C, D, H, W), grid (B, D', H', W', 3) of (x, y, z) in [-1, 1]
    → (B, C, D', H', W'), trilinear, zero padding."""
    b, c, d, h, w = vol.shape

    def to_idx(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    ix = to_idx(grid[..., 0], w)
    iy = to_idx(grid[..., 1], h)
    iz = to_idx(grid[..., 2], d)

    def sample_one(v, gz, gy, gx):  # v: (D, H, W)
        return jax.scipy.ndimage.map_coordinates(
            v, [gz, gy, gx], order=1, mode="constant", cval=0.0
        )

    def sample_bc(v_bc, gz, gy, gx):  # over channels
        return jax.vmap(lambda v: sample_one(v, gz, gy, gx))(v_bc)

    return jax.vmap(sample_bc)(vol, iz, iy, ix)


class MultiViewResampler:
    """Re-render an LCT volume from alternate viewpoints."""

    def __init__(
        self,
        spatial: int,
        tdim: int,
        trange: float,
        wall_size: float = 2.0,
        align_corners: bool = False,
    ):
        self.align_corners = align_corners
        self.rotations = view_rotations(False)
        base = _normalized_grid(tdim, spatial, spatial, align_corners)

        # Per-view rotated grids: conjugate each rotation by diag(1,-1,-1)
        # (the reference's rev-rotate-rev dance, tfmodule.py:88-100).
        s = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
        self.view_grids = np.stack(
            [base @ (s @ m @ s) for m in self.rotations]
        )  # (26, D, H, W, 3)

        # Z-crop grid: compress the z coordinate by (trange/2)/wall_size
        # (tfmodule.py:62-68).
        zc = base.copy()
        z01 = (zc[..., 2] + 1) / 2
        zc[..., 2] = z01 / ((trange / 2) / wall_size) * 2 - 1
        self.zcrop_grid = zc

    def __call__(
        self, vol: jax.Array, views: Sequence[int]
    ) -> jax.Array:
        """vol (B, C, T, H, W); one view per batch element
        (tfmodule.py:105-119)."""
        b = vol.shape[0]
        zg = jnp.broadcast_to(
            jnp.asarray(self.zcrop_grid)[None], (b,) + self.zcrop_grid.shape
        )
        volz = grid_sample_3d(vol, zg, self.align_corners)
        vg = jnp.stack([jnp.asarray(self.view_grids[v]) for v in views])
        return grid_sample_3d(volz, vg, self.align_corners)
