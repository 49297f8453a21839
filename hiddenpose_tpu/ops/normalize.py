"""Per-sample, per-channel min/max normalisation ops.

TPU layout note: these reduce over all non-(batch, channel) axes, so they are
layout-agnostic; XLA fuses them into neighbouring elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(x):
    """Min/max-normalise to [0, 1] per (batch, channel).

    Mirrors `models/feature_propagation.py:260-270`. x: (B, C, ...) any rank.
    """
    b, c = x.shape[:2]
    flat = x.reshape(b, c, -1)
    flat = flat - flat.min(axis=2, keepdims=True)
    flat = flat / (flat.max(axis=2, keepdims=True) + 1e-15)
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
    flat = x.reshape(b, -1, c)
    flat = flat - flat.min(axis=1, keepdims=True)
    flat = flat / (flat.max(axis=1, keepdims=True) + 1e-15)
    return flat.reshape(x.shape)


def normalize_feature_last(x):
    return normalize_last(x) * 10.0
