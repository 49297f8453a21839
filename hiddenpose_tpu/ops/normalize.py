"""Per-sample, per-channel min/max normalisation ops.

TPU layout note: these reduce over all non-(batch, channel) axes, so they are
layout-agnostic; XLA fuses them into neighbouring elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _minmax(flat, axis):
    """Single-pass (min, max) via a variadic lax.reduce — jnp.min + jnp.max
    cost two full reads of the volume each way."""
    init_lo = jnp.asarray(jnp.inf, flat.dtype)
    init_hi = jnp.asarray(-jnp.inf, flat.dtype)

    def comp(acc, val):
        return (
            jnp.minimum(acc[0], val[0]), jnp.maximum(acc[1], val[1])
        )

    return jax.lax.reduce((flat, flat), (init_lo, init_hi), comp, (axis,))


def normalize(x):
    """Min/max-normalise to [0, 1] per (batch, channel).

    Mirrors `models/feature_propagation.py:260-270`. x: (B, C, ...) any rank.
    """
    b, c = x.shape[:2]
    flat = x.reshape(b, c, -1)
    lo, hi = _minmax(flat, 2)
    lo = lo[:, :, None]
    flat = (flat - lo) / (hi[:, :, None] - lo + 1e-15)
    return flat.reshape(x.shape)


def normalize_feature(x):
    """Min/max-normalise then scale x10.

    Mirrors `models/feature_propagation.py:273-286`.  NOTE the reference's
    `nn.ReLU()(data)` at :274 discards its result (not in-place), so no ReLU
    is actually applied — that quirk is preserved deliberately.
    """
    return normalize(x) * 10.0


def normalize_last(x):
    """Channels-last variant: normalise over all axes except batch and the
    trailing channel axis. x: (B, ..., C)."""
    b, c = x.shape[0], x.shape[-1]
    if c == 1:
        # Hot path (the t128 pipeline's post-LCT normalize has ch=1): a
        # (B, N, 1) middle-axis reduce puts the size-1 channel axis on the
        # minor (lane) dim — 1/128 lane occupancy, measured 3.7 ms at
        # 50 GB/s for a 17 MB volume (round-4 MFU table).  C=1 makes the
        # (B, N) reshape a free bitcast, and minor-axis reductions run at
        # full lane width.
        flat = x.reshape(b, -1)
        lo = jnp.min(flat, axis=1, keepdims=True)
        hi = jnp.max(flat, axis=1, keepdims=True)
        flat = (flat - lo) / (hi - lo + 1e-15)
        return flat.reshape(x.shape)
    flat = x.reshape(b, -1, c)
    lo, hi = _minmax(flat, 1)
    lo = lo[:, None, :]
    flat = (flat - lo) / (hi[:, None, :] - lo + 1e-15)
    return flat.reshape(x.shape)


def normalize_feature_last(x):
    return normalize_last(x) * 10.0
