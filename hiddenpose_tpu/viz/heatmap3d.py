"""3D heatmap scatter visualisation (reference `utils/heatmap3d.py:10-41`)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def plot_heatmap3d(volume, out_dir: str, name: str,
                   threshold: float = 0.5, max_points: int = 20000) -> str:
    """Scatter-plot voxels above `threshold` x max, coloured by intensity."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    v = np.asarray(volume)
    while v.ndim > 3:
        v = v[0]
    peak = v.max()
    zs, ys, xs = np.nonzero(v > threshold * peak)
    vals = v[zs, ys, xs]
    if len(vals) > max_points:
        sel = np.argsort(vals)[-max_points:]
        zs, ys, xs, vals = zs[sel], ys[sel], xs[sel], vals[sel]

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    sc = ax.scatter(xs, ys, zs, c=vals, cmap="hot", s=4, alpha=0.5)
    fig.colorbar(sc, shrink=0.6)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.set_title(name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path
