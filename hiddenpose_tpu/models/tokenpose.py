"""TokenPose-style 2D keypoint transformer.

Re-design of `/root/reference/models/tokenpose.py:32-319` (TokenPose_L):
feature map → patch embedding, ``num_keypoints`` learnable keypoint tokens,
THREE stacked transformers (depth each; the 'sine-full' mode re-adds the
positional table to the patch tokens before every attention after the first),
the keypoint tokens of all three stages concatenated → LayerNorm+Linear MLP
head → per-keypoint heatmaps (heatmap_size[0] x heatmap_size[1]).

Config values from `models/token_config.py:40-58`: dim=192, depth=2 per
stage, heads=8 (scale_with_head), mlp ratio 3, patch 4x4, sine-full.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def sine_position_embedding(h: int, w: int, d_model: int,
                            temperature: float = 10000.0) -> np.ndarray:
    """DETR-style 2D sine table, (1, h*w, d_model)
    (`models/tokenpose.py:143-167`)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = np.arange(1, h + 1, dtype=np.float64)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float64)[None, :].repeat(h, 0)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale

    half = d_model // 2
    dim_t = np.arange(half, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t

    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])],
                        axis=-1).reshape(h, w, -1)

    pos = np.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1)
    return pos.reshape(1, h * w, d_model).astype(np.float32)


class TokenAttention(nn.Module):
    dim: int
    heads: int = 8
    scale_with_head: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = self.heads
        dh = self.dim // h
        scale = dh ** -0.5 if self.scale_with_head else self.dim ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = x.shape

        def heads_first(t):
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class TokenTransformer(nn.Module):
    """depth x (PreNorm attention + PreNorm GELU MLP), with the sine-full
    positional re-injection on patch tokens (`models/tokenpose.py:300-320`)."""

    dim: int
    depth: int
    heads: int
    mlp_dim: int
    num_keypoints: int
    all_attn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        k = self.num_keypoints
        for i in range(self.depth):
            if i > 0 and self.all_attn and pos is not None:
                x = jnp.concatenate([x[:, :k], x[:, k:] + pos], axis=1)
            a = TokenAttention(self.dim, self.heads, dtype=self.dtype,
                               name=f"attn_{i}")
            x = x + a(nn.LayerNorm(name=f"ln_a_{i}")(x))
            y = nn.LayerNorm(name=f"ln_f_{i}")(x)
            y = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"mlp_in_{i}")(y)
            y = jax.nn.gelu(y)
            y = nn.Dense(self.dim, dtype=self.dtype, name=f"mlp_out_{i}")(y)
            x = x + y
        return x


class TokenPose(nn.Module):
    """feature (B, C, H, W) → heatmaps (B, num_keypoints, hm_h, hm_w)."""

    feature_size: Tuple[int, int] = (64, 64)
    patch_size: Tuple[int, int] = (4, 4)
    num_keypoints: int = 24
    dim: int = 192
    channels: int = 128
    depth: int = 2
    heads: int = 8
    mlp_ratio: int = 3
    hidden_heatmap_dim: int = 384
    heatmap_size: Tuple[int, int] = (64, 64)
    pos_embedding_type: str = "sine-full"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feature: jax.Array) -> jax.Array:
        b, c, fh, fw = feature.shape
        ph, pw = self.patch_size
        hp, wp = fh // ph, fw // pw
        n = hp * wp

        x = feature.reshape(b, c, hp, ph, wp, pw)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b, n, ph * pw * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed")(x)

        kp_token = self.param(
            "keypoint_token", nn.initializers.truncated_normal(0.02),
            (1, self.num_keypoints, self.dim),
        )
        kp = jnp.broadcast_to(kp_token, (b, self.num_keypoints, self.dim))

        if self.pos_embedding_type in ("sine", "sine-full"):
            pos = jnp.asarray(sine_position_embedding(hp, wp, self.dim))
            x = jnp.concatenate([kp, x + pos[:, :n]], axis=1)
        elif self.pos_embedding_type == "learnable":
            pos_p = self.param(
                "pos_embedding", nn.initializers.truncated_normal(0.02),
                (1, n + self.num_keypoints, self.dim),
            )
            x = jnp.concatenate([kp, x], axis=1) + pos_p
            pos = None
        else:
            x = jnp.concatenate([kp, x], axis=1)
            pos = None

        all_attn = self.pos_embedding_type == "sine-full"
        outs = []
        for s in range(3):
            x = TokenTransformer(
                self.dim, self.depth, self.heads, self.dim * self.mlp_ratio,
                self.num_keypoints, all_attn=all_attn, dtype=self.dtype,
                name=f"transformer{s + 1}",
            )(x, pos if all_attn else None)
            outs.append(x[:, : self.num_keypoints])

        tokens = jnp.concatenate(outs, axis=2)  # (B, K, 3*dim)
        hm_dim = self.heatmap_size[0] * self.heatmap_size[1]
        y = nn.LayerNorm(name="head_ln")(tokens)
        if self.dim * 3 <= self.hidden_heatmap_dim * 0.5:
            y = nn.Dense(self.hidden_heatmap_dim, dtype=self.dtype,
                         name="head_hidden")(y)
            y = nn.LayerNorm(name="head_ln2")(y)
        y = nn.Dense(hm_dim, dtype=self.dtype, name="head_out")(y)
        return y.reshape(b, self.num_keypoints, *self.heatmap_size)
