"""NlosPoseSformer — TimeSformer-style joint-token pose transformer.

Re-design of `/root/reference/models/NlosPoseSformer.py:11-319`:

* video → patch embedding (p x p patches per frame, linear proj)
* 24 learnable joint tokens prepended
* per layer: (optional, default-off) divided time attention, spatial
  attention, GEGLU feed-forward — each pre-LayerNormed with residuals.  The
  reference ships with time attention disabled (`NlosPoseSformer.py:133-135`
  commented out); ``use_time_attn`` preserves that default.
* joint tokens attend over ALL tokens; patch tokens attend within their
  frame (spatial) over [joint tokens ‖ frame patches], with axial rotary
  embeddings on the patch q/k (`NlosPoseSformer.py:284-319`).
* head: LayerNorm + Linear(dim → out_dim) on the joint tokens, reshaped
  'b n (p d) -> b n p d' with p=4 (`NlosPoseSformer.py:143-145`).

TPU notes: attention is batched einsum (MXU); rotary tables are trace-time
constants (`models/rotary.py`); the token reshapes are pure layout ops that
XLA folds away.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hiddenpose_tpu.models.rotary import apply_rotary, rotary_1d, rotary_axial

Dtype = Any


def _attend(q, k, v):
    """Softmax attention over (..., n, d) with batched heads folded in
    (`NlosPoseSformer.py:174-183`).  On TPU, eligible shapes (the grouped
    patch attention: ~1k tokens, head dim 32) run in the fused VMEM
    Pallas kernel — the XLA lowering materialises the f32 similarity
    tensor to HBM (~4.4 GB/layer at realdata scale) and is bandwidth-
    bound; see ops/pallas/attn_vmem.py.  The joint-token read over all
    f*n patches (Lk ~131k) exceeds the kernel's VMEM envelope and stays
    on the XLA path, whose similarity tensor is 44x smaller."""
    from hiddenpose_tpu.ops.pallas.attn_vmem import (
        attend_fused,
        attend_fused_supported,
        attn_route,
    )

    if attn_route() == "fused" and attend_fused_supported(q.shape, k.shape):
        return attend_fused(q, k, v)
    sim = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bij,bjd->bid", attn, v)


class JointTokenAttention(nn.Module):
    """Divided space/time attention with global summary tokens.

    Generalises the reference's two attention operators — 24 joint tokens
    (`NlosPoseSformer.py:284-319`) and the 1 cls token of the generic
    TimeSformer (`models/transformer.py:89-150`) — into one module:
    ``num_summary`` tokens attend over everything; patch tokens attend
    within their frame (``over='space'``) or across frames at a fixed
    position (``over='time'``), always also seeing the summary tokens as
    keys/values.
    """

    dim: int
    heads: int = 8
    dim_head: int = 32
    num_summary: int = 24
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, f: int, n: int, over: str = "space", rot=None):
        """x: (b, num_summary + f*n, dim); tokens ordered (frame, position)."""
        h, dh, j = self.heads, self.dim_head, self.num_summary
        inner = h * dh
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):  # (b, n, h*dh) -> (b*h, n, dh)
            b, nn_, _ = t.shape
            t = t.reshape(b, nn_, h, dh).transpose(0, 2, 1, 3)
            return t.reshape(b * h, nn_, dh)

        q, k, v = map(split_heads, (q, k, v))
        q = q * (dh ** -0.5)

        jq, pq = q[:, :j], q[:, j:]
        jk, pk = k[:, :j], k[:, j:]
        jv, pv = v[:, :j], v[:, j:]

        # Summary tokens read everything (global context).
        joints_out = _attend(jq, k, v)

        # Patch tokens attend within their group.
        bh = pq.shape[0]
        if over == "space":
            g, ng = n, f  # groups = frames, each of n positions

            def regroup(t):
                return t.reshape(bh * ng, g, dh)

            def ungroup(t):
                return t.reshape(bh, f * n, dh)
        else:  # 'time': group = a fixed position across f frames
            g, ng = f, n

            def regroup(t):
                return (
                    t.reshape(bh, f, n, dh).transpose(0, 2, 1, 3)
                    .reshape(bh * n, f, dh)
                )

            def ungroup(t):
                return (
                    t.reshape(bh, n, f, dh).transpose(0, 2, 1, 3)
                    .reshape(bh, f * n, dh)
                )

        pq, pk, pv = map(regroup, (pq, pk, pv))
        if rot is not None:
            pq, pk = apply_rotary(pq, pk, rot)

        # Every group also sees the (replicated) summary tokens as k/v.
        jk_r = jnp.repeat(jk, ng, axis=0)
        jv_r = jnp.repeat(jv, ng, axis=0)
        pk = jnp.concatenate([jk_r, pk], axis=1)
        pv = jnp.concatenate([jv_r, pv], axis=1)
        patches_out = ungroup(_attend(pq, pk, pv))

        out = jnp.concatenate([joints_out, patches_out], axis=1)
        b = x.shape[0]
        out = out.reshape(b, h, -1, dh).transpose(0, 2, 1, 3)
        out = out.reshape(b, -1, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype,
                          name="in")(x)
        a, gates = jnp.split(hidden, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(
            a * jax.nn.gelu(gates)
        )


class NlosPoseSformer(nn.Module):
    dim: int = 256
    num_frames: int = 16
    num_joints: int = 24
    image_size: int = 128
    patch_size: int = 4
    channels: int = 1
    depth: int = 8
    heads: int = 8
    dim_head: int = 32
    rotary_emb: bool = True
    out_dim: int = (64 * 2 + 128) * 2
    use_time_attn: bool = False  # reference default: disabled
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        """video: (b, f, c, h, w) → (b, num_joints, 4, out_dim // 4)."""
        b, f, c, h, w = video.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0
        hp, wp = h // p, w // p
        n = hp * wp

        # Patchify: (b, f, c, hp, p, wp, p) → (b, f*hp*wp, p*p*c).
        x = video.reshape(b, f, c, hp, p, wp, p)
        x = x.transpose(0, 1, 3, 5, 4, 6, 2).reshape(b, f * n, p * p * c)
        tokens = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed")(x)

        joints_token = self.param(
            "joints_token",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, self.num_joints, self.dim),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(joints_token, (b, self.num_joints, self.dim)),
             tokens], axis=1,
        )

        frame_rot = image_rot = None
        if self.rotary_emb:
            frame_rot = rotary_1d(f, self.dim_head)
            image_rot = rotary_axial(hp, wp, self.dim_head)
        else:
            pos = self.param(
                "pos_emb", nn.initializers.normal(0.02),
                (1, self.num_joints + f * n, self.dim),
            )
            x = x + pos

        for i in range(self.depth):
            if self.use_time_attn:
                t_attn = JointTokenAttention(
                    self.dim, self.heads, self.dim_head, self.num_joints,
                    dtype=self.dtype, name=f"time_attn_{i}",
                )
                x = x + t_attn(
                    nn.LayerNorm(name=f"time_ln_{i}")(x),
                    f=f, n=n, over="time", rot=frame_rot,
                )
            s_attn = JointTokenAttention(
                self.dim, self.heads, self.dim_head, self.num_joints,
                dtype=self.dtype, name=f"spatial_attn_{i}",
            )
            x = x + s_attn(
                nn.LayerNorm(name=f"spatial_ln_{i}")(x),
                f=f, n=n, over="space", rot=image_rot,
            )
            ff = GEGLUFeedForward(self.dim, dtype=self.dtype, name=f"ff_{i}")
            x = x + ff(nn.LayerNorm(name=f"ff_ln_{i}")(x))

        joints = x[:, : self.num_joints]
        out = nn.LayerNorm(name="out_ln")(joints)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")(out)
        return out.reshape(b, self.num_joints, 4, self.out_dim // 4)


def sformer_from_config(cfg) -> NlosPoseSformer:
    """Build from ModelConfig (cfg.* transformer fields,
    `config/config_noise.py:41-53`)."""
    return NlosPoseSformer(
        dim=cfg.patch_feature_dim,
        num_frames=cfg.num_frames,
        num_joints=cfg.num_joints,
        image_size=cfg.image_size[0],
        patch_size=cfg.patch_size,
        channels=cfg.in_channels,
        depth=cfg.depth,
        heads=cfg.heads,
        dim_head=cfg.dim_head,
        rotary_emb=cfg.rotary_emb,
        out_dim=cfg.out_dim,
        dtype=jnp.dtype(cfg.compute_dtype),
    )
