"""Rotary position embeddings (1D temporal + 2D axial).

Re-design of `/root/reference/models/rotary.py:7-62` as pure functions of
static shapes — the sin/cos tables are computed at trace time and folded into
the compiled program (no device-side arange/linspace needed).

Semantics preserved:
* 1D: inv_freq_i = 10000^(-2i/d); table = outer(positions, inv_freqs)
  duplicated along the feature axis → sin/cos of shape (1, n, d).
* Axial: per-axis logspace scales (dim//4 of them, base 2, up to
  max_freq/2), positions linspace(-1, 1) scaled by π; sin/cos of the two
  axes concatenated then element-duplicated → (1, h*w, d).
* apply_rotary rotates only the leading `rot_dim` features of q/k and passes
  the rest through (`models/NlosPoseSformer.py:166-172`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotate_every_two(x: jax.Array) -> jax.Array:
    """(..., 2k) → pairs (x1, x2) → (-x2, x1) interleaved back."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(x.shape)


def _duplicate_pairs(t: np.ndarray) -> np.ndarray:
    """(..., d) → (..., 2d) with each feature repeated twice (einops
    'n d -> n (d 2)')."""
    return np.repeat(t, 2, axis=-1)


def rotary_1d(n: int, dim: int) -> Tuple[jax.Array, jax.Array]:
    """Temporal rotary table: (sin, cos), each (1, n, dim).

    Divergence note: the reference lays its 1D table out as cat(f, f)
    (`models/rotary.py:59-60`) yet rotates adjacent pairs — mixing the
    rotate-half layout with rotate-every-two pairing, which is not a true
    rotation (each pair sees two different frequencies).  That code path is
    dead there (time attention disabled, `NlosPoseSformer.py:133`).  Here
    the table duplicates each frequency pairwise (like the reference's own
    axial table), giving a genuine rotary embedding with the relative-
    position property.
    """
    inv_freqs = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs = np.outer(np.arange(n, dtype=np.float64), inv_freqs)
    freqs = _duplicate_pairs(freqs)[None]
    return jnp.asarray(np.sin(freqs), jnp.float32), jnp.asarray(
        np.cos(freqs), jnp.float32
    )


def rotary_axial(h: int, w: int, dim: int, max_freq: float = 10.0
                 ) -> Tuple[jax.Array, jax.Array]:
    """2D axial rotary table over an h x w patch grid: (sin, cos), each
    (1, h*w, dim)."""
    n_scales = dim // 4
    scales = np.logspace(
        0.0, math.log(max_freq / 2) / math.log(2), n_scales, base=2,
        dtype=np.float64,
    )
    h_seq = np.linspace(-1.0, 1.0, h)[:, None] * scales[None] * math.pi
    w_seq = np.linspace(-1.0, 1.0, w)[:, None] * scales[None] * math.pi
    x_sinu = np.broadcast_to(h_seq[:, None, :], (h, w, n_scales))
    y_sinu = np.broadcast_to(w_seq[None, :, :], (h, w, n_scales))
    sin = np.concatenate([np.sin(x_sinu), np.sin(y_sinu)], axis=-1)
    cos = np.concatenate([np.cos(x_sinu), np.cos(y_sinu)], axis=-1)
    sin = _duplicate_pairs(sin.reshape(h * w, -1))[None]
    cos = _duplicate_pairs(cos.reshape(h * w, -1))[None]
    return jnp.asarray(sin, jnp.float32), jnp.asarray(cos, jnp.float32)


def apply_rotary(
    q: jax.Array, k: jax.Array, rot: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Rotate the leading rot_dim features of q/k; pass the tail through."""
    sin, cos = rot
    rot_dim = sin.shape[-1]

    def rot_fn(t):
        t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
        t_rot = t_rot * cos + rotate_every_two(t_rot) * sin
        return jnp.concatenate([t_rot, t_pass], axis=-1)

    return rot_fn(q), rot_fn(k)
