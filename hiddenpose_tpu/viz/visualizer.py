"""Qualitative visualisation artifacts.

Re-design of `/root/reference/utils/visualizer.py:14-185` (volume_log /
joints_log / threeviews_log), `utils/vis_3view.py:7-60` and
`utils/vis_3views.py:4-27`: matplotlib, host-side, file outputs only (the
training signal of the reference is these images — SURVEY §4.3).

All functions accept NumPy arrays (callers `.device_get` first); volumes are
(B, C, D, H, W) or (D, H, W).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# SMPL skeleton bone links (parent→child), as drawn by the reference's
# joints_log (`utils/visualizer.py:66-150`) / named in `utils/save_res.py`.
SMPL_BONES = [
    (0, 1), (0, 2), (0, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8),
    (6, 9), (7, 10), (8, 11), (9, 12), (9, 13), (9, 14), (12, 15),
    (13, 16), (14, 17), (16, 18), (17, 19), (18, 20), (19, 21),
    (20, 22), (21, 23),
]

SMPL_JOINT_NAMES = [
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot",
    "right_foot", "neck", "left_collar", "right_collar", "head",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hand", "right_hand",
]


def _vol3d(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x)
    while x.ndim > 3:
        x = x[0]
    return x


def _save(fig, out_dir: str, name: str):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


def volume_log(volume, out_dir: str, name: str, step: int = 0,
               joints: Optional[np.ndarray] = None) -> str:
    """Axis-sum projections of a volume, optional joint overlay
    (reference `volume_log`, `utils/visualizer.py:14-63`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    v = _vol3d(volume)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    titles = ["front (sum z)", "left (sum y)", "top (sum x)"]
    for ax, axis, title in zip(axes, (0, 1, 2), titles):
        proj = v.sum(axis=axis)
        ax.imshow(proj, cmap="hot")
        ax.set_title(title)
        ax.axis("off")
    if joints is not None:
        # Overlay on all three projections like the reference
        # (`utils/visualizer.py:31-56`: front (h,w), top (d,w), left (d,h)).
        j = np.asarray(joints).reshape(-1, 3)  # (d, h, w)
        axes[0].scatter(j[:, 2], j[:, 1], s=6, c="cyan")  # front: x=w, y=h
        axes[1].scatter(j[:, 2], j[:, 0], s=6, c="cyan")  # left:  x=w, y=d
        axes[2].scatter(j[:, 1], j[:, 0], s=6, c="cyan")  # top:   x=h, y=d
    fig.suptitle(f"{name} @ {step}")
    return _save(fig, out_dir, name)


def threeviews_log(volume, out_dir: str, name: str, step: int = 0) -> str:
    """Max-projections along the three axes (reference `threeviews_log`,
    `utils/visualizer.py:155-185`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    v = np.clip(_vol3d(volume), 0, None)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, axis, title in zip(
        axes, (0, 1, 2), ["front", "left", "top"]
    ):
        proj = v.max(axis=axis)
        peak = proj.max()
        ax.imshow(proj / peak if peak > 0 else proj, cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    fig.suptitle(f"{name} @ {step}")
    return _save(fig, out_dir, name)


def joints_log(joints: np.ndarray, out_dir: str, name: str,
               step: int = 0) -> str:
    """3D skeleton scatter + bone links + .txt dump (reference `joints_log`,
    `utils/visualizer.py:66-150`).  joints: (J, 3) in (d, h, w) order."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    j = np.asarray(joints).reshape(-1, 3)
    os.makedirs(out_dir, exist_ok=True)
    np.savetxt(os.path.join(out_dir, f"{name}.txt"), j)

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    # plot as (w, d, h) so the figure is upright
    ax.scatter(j[:, 2], j[:, 0], j[:, 1], c="r", s=12)
    for a, b in SMPL_BONES:
        if a < len(j) and b < len(j):
            ax.plot(
                [j[a, 2], j[b, 2]], [j[a, 0], j[b, 0]], [j[a, 1], j[b, 1]],
                c="b", linewidth=1,
            )
    ax.invert_zaxis()
    ax.set_xlabel("w")
    ax.set_ylabel("d")
    ax.set_zlabel("h")
    ax.set_title(f"{name} @ {step}")
    return _save(fig, out_dir, name)


def vis_3view(volume, out_dir: str = ".", name: str = "views") -> str:
    """Standalone 3-view max-projection image (reference `vis_3view`,
    `utils/vis_3view.py:7-60`)."""
    return threeviews_log(volume, out_dir, name)


def plot_volume_html(volume, out_path: str, threshold: float = 0.5) -> Optional[str]:
    """Interactive isosurface via plotly if available (reference `PlotVolume`,
    `utils/PlotVolume.py:8-38`); returns None when plotly is absent."""
    try:
        import plotly.graph_objects as go
    except Exception:
        return None
    v = _vol3d(volume)
    d, h, w = v.shape
    z, y, x = np.mgrid[0:d, 0:h, 0:w]
    fig = go.Figure(
        data=go.Volume(
            x=x.ravel(), y=y.ravel(), z=z.ravel(), value=v.ravel(),
            isomin=threshold * float(v.max()), opacity=0.1, surface_count=8,
        )
    )
    fig.write_html(out_path)
    return out_path
