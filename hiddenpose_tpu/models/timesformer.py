"""Generic TimeSformer (divided space-time attention video transformer).

Re-design of `/root/reference/models/transformer.py:89-257`: patch embed +
one cls token, per layer (time attention → spatial attention → GEGLU FF, all
pre-normed residual), optional token-shift before each sub-layer
(`PreTokenShift`, `transformer.py:60-80`), head LayerNorm+Linear on the cls
token → num_classes outputs (24*3 joints by default).

Shares :class:`hiddenpose_tpu.models.sformer.JointTokenAttention`
(num_summary=1 = the cls token) and the rotary tables.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from hiddenpose_tpu.models.rotary import rotary_1d, rotary_axial
from hiddenpose_tpu.models.sformer import GEGLUFeedForward, JointTokenAttention

Dtype = Any


def token_shift(x: jax.Array, f: int, n: int, num_summary: int = 1) -> jax.Array:
    """Temporal token shift: split channels in thirds — one third from the
    previous frame, one from the next, one unshifted
    (`models/transformer.py:60-80`).  Summary tokens pass through."""
    summary, patches = x[:, :num_summary], x[:, num_summary:]
    b, _, d = x.shape
    p = patches.reshape(b, f, n, d)
    c = d // 3
    back = jnp.pad(p[:, :-1, :, :c], ((0, 0), (1, 0), (0, 0), (0, 0)))
    fwd = jnp.pad(p[:, 1:, :, c:2 * c], ((0, 0), (0, 1), (0, 0), (0, 0)))
    shifted = jnp.concatenate([back, fwd, p[..., 2 * c:]], axis=-1)
    return jnp.concatenate([summary, shifted.reshape(b, f * n, d)], axis=1)


class TimeSformer(nn.Module):
    dim: int = 256
    num_frames: int = 16
    num_classes: int = 24 * 3
    image_size: int = 224
    patch_size: int = 16
    channels: int = 3
    depth: int = 12
    heads: int = 8
    dim_head: int = 64
    rotary_emb: bool = True
    shift_tokens: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        """video: (b, f, c, h, w) → (b, num_classes)."""
        b, f, c, h, w = video.shape
        p = self.patch_size
        hp, wp = h // p, w // p
        n = hp * wp

        x = video.reshape(b, f, c, hp, p, wp, p)
        x = x.transpose(0, 1, 3, 5, 4, 6, 2).reshape(b, f * n, p * p * c)
        tokens = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed")(x)

        cls = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), tokens], axis=1
        )

        frame_rot = image_rot = None
        if self.rotary_emb:
            frame_rot = rotary_1d(f, self.dim_head)
            image_rot = rotary_axial(hp, wp, self.dim_head)
        else:
            pos = self.param(
                "pos_emb", nn.initializers.normal(0.02),
                (1, 1 + f * n, self.dim),
            )
            x = x + pos

        maybe_shift = (
            (lambda t: token_shift(t, f, n)) if self.shift_tokens
            else (lambda t: t)
        )

        for i in range(self.depth):
            t_attn = JointTokenAttention(
                self.dim, self.heads, self.dim_head, num_summary=1,
                dtype=self.dtype, name=f"time_attn_{i}",
            )
            x = x + t_attn(
                maybe_shift(
                    nn.LayerNorm(name=f"time_ln_{i}")(x)
                ),
                f=f, n=n, over="time", rot=frame_rot,
            )
            s_attn = JointTokenAttention(
                self.dim, self.heads, self.dim_head, num_summary=1,
                dtype=self.dtype, name=f"spatial_attn_{i}",
            )
            x = x + s_attn(
                maybe_shift(
                    nn.LayerNorm(name=f"spatial_ln_{i}")(x)
                ),
                f=f, n=n, over="space", rot=image_rot,
            )
            ff = GEGLUFeedForward(self.dim, dtype=self.dtype, name=f"ff_{i}")
            x = x + ff(
                maybe_shift(
                    nn.LayerNorm(name=f"ff_ln_{i}")(x)
                )
            )

        cls_out = nn.LayerNorm(name="out_ln")(x[:, 0])
        return nn.Dense(self.num_classes, dtype=self.dtype, name="out_proj")(
            cls_out
        )
