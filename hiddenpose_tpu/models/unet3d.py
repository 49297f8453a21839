"""3D U-Net denoising autoencoder (channels-planes internally).

Re-design of `/root/reference/unet/unet3d.py:11-118`: 4-level encoder/decoder,
DoubleConv = (conv k3 SAME → GroupNorm(4) → ReLU) x 2, MaxPool3d(2) down,
trilinear (align_corners) x2 up with centre-pad + skip concat, 1x1x1 out conv.

TPU design (round 2): every volume runs channels-planes (B, C, D, H, W) —
W in lanes, H in sublanes — because at this net's 1-32 channels the
channels-last layout starves the lane dimension.  The convolutions go
through `StencilConv3`: on TPU inference that is the fused Pallas stencil
kernel (`ops/pallas/conv3p.py`, measured ~2-4x the XLA conv at 128^3);
training and CPU use the equivalent XLA conv, so autodiff is untouched.
GroupNorm/pool/resize are cheap XLA ops on the planes layout.  The
boundary transposes to/from the external channels-last API are free
reshapes at in_channels=1 (the live config).

Param tree is identical to round 1 (conv{1,2}/gn{1,2} per block, 'out'):
checkpoints restore unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hiddenpose_tpu.models.blocks import StencilConv3, pallas_enabled

Dtype = Any


class GroupNormP(nn.Module):
    """GroupNorm over a channels-planes (B, C, D, H, W) volume.

    Matches torch GroupNorm semantics (`unet/unet3d.py:14,20`:
    GroupNorm(4, C)); params named scale/bias like nn.GroupNorm.
    epsilon is torch's 1e-5 default (flax's is 1e-6) — checkpoint-import
    parity (`tests/test_torch_import.py`) pins this."""

    num_groups: int = 4
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, c = x.shape[:2]
        g = min(self.num_groups, c)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(b, g, c // g, *x.shape[2:]).astype(jnp.float32)
        mean = xg.mean(axis=(2, 3, 4, 5), keepdims=True)
        var = xg.var(axis=(2, 3, 4, 5), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = xg.reshape(x.shape)
        out = out * scale[None, :, None, None, None] \
            + bias[None, :, None, None, None]
        return out.astype(x.dtype)


class DoubleConv(nn.Module):
    """(conv3 SAME → GN(4) → ReLU) x 2 in planes layout.

    Reference: `unet/unet3d.py:11-28`."""

    features: int
    num_groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, use_pallas: bool = False):
        for i in (1, 2):
            xp = StencilConv3(
                self.features, pad_mode="zero", dtype=self.dtype,
                name=f"conv{i}",
            )(xp, use_pallas=use_pallas)
            xp = GroupNormP(self.num_groups, name=f"gn{i}")(xp)
            xp = nn.relu(xp)
        return xp


def _max_pool2_impl(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 1, 2, 2, 2), (1, 1, 2, 2, 2), "VALID",
    )


def max_pool2_planes(x):
    """MaxPool3d(2, 2) on (B, C, D, H, W).

    Custom VJP: jax's default max-pool gradient lowers to
    `select-and-scatter`, which costs 14.9 ms (plus two ~3 ms layout
    copies around it) for the (2, 4, 128^3) top level of the UNet inside
    the train-step backward (profiled in tpu_jobs/002).  The rewrite
    routes the cotangent with phase-slice equality masks — pure
    elementwise work.  Semantics match select_and_scatter exactly: the
    gradient goes to the FIRST maximal element in row-major window order
    (tested incl. the all-ties case).

    The custom backward's pair-mask algebra assumes even D/H/W (the
    nearest-upsample of the pooled output must tile the input exactly);
    odd dims — where VALID pooling drops the remainder — fall back to the
    native VJP instead of failing at trace time."""
    if any(s % 2 for s in x.shape[2:5]):
        return _max_pool2_impl(x)
    return _max_pool2_custom(x)


@jax.custom_vjp
def _max_pool2_custom(x):
    return _max_pool2_impl(x)


def _max_pool2_fwd(x):
    y = _max_pool2_impl(x)
    return y, (x, y)


def _pair_mate(t, axis):
    """Swap elements within non-overlapping pairs along `axis`:
    out[2k] = t[2k+1], out[2k+1] = t[2k].  Rolls + a parity select —
    stays elementwise (no strided slices, which lower to gathers)."""
    fwd = jnp.roll(t, -1, axis)
    bwd = jnp.roll(t, 1, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, axis)
    return jnp.where(idx % 2 == 0, fwd, bwd)


def _pair_prev(t, axis):
    """OR-of-earlier-mate within pairs: out[2k] = False, out[2k+1] = t[2k]."""
    bwd = jnp.roll(t, 1, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, axis)
    return jnp.where(idx % 2 == 1, bwd, jnp.zeros((), t.dtype)).astype(bool)


def _pool2_pallas_eligible(x) -> bool:
    """Route the pool backward through the Pallas VMEM kernel
    (`ops/pallas/pool2p.py`) on TPU: the elementwise formulation below is
    algebraically minimal but its rolls lower to HBM slice+concat DMA
    pairs at planes layout — 40 of the UNet gradient's async slice DMAs
    in the round-4 profile (BENCH_NOTES).  Bit-identical routing
    (first-match), tested in tests/test_pool2p.py.  HP_POOL2P=0 restores
    the XLA path for A/B."""
    import os

    # Default ON since the round-5 on-chip validation (tpu_jobs/129b):
    # kernel-vs-XLA bit-exact at three shapes incl. ties on hardware, and
    # the composed UNet grad measured 44.9 -> 43.9 ms.  (The same job also
    # showed the pool rolls were NOT the dominant UNet-grad cost the
    # round-4 attribution suggested — the win is real but ~1 ms.)
    if os.environ.get("HP_POOL2P", "1") != "1" or not pallas_enabled():
        return False
    _, _, d, h, w = x.shape
    return d % 2 == 0 and h % 16 == 0 and w % 16 == 0 and w <= 128


def _max_pool2_bwd(res, dy):
    x, y = res
    if _pool2_pallas_eligible(x):
        from hiddenpose_tpu.ops.pallas.pool2p import pool2_bwd_planes_pallas

        return (pool2_bwd_planes_pallas(x, dy),)
    # All-elementwise formulation in the ORIGINAL layout.  Three earlier
    # attempts lowered badly on TPU (profiles in tpu_jobs/004/005/011/012):
    # strided `x[:, :, p::2]` slices became 2.8 ms gather fusions,
    # `.at[::2].set` became 16 ms scatters, interior-padded adds stayed
    # unfused at C-minor layouts, and the phase-major transpose pair cost
    # ~27 ms in 8-D relayouts.  Here everything is rolls / parity selects /
    # compares at the pool input's own layout:
    #   m     = (x == y↑)                    (y↑ = nearest upsample)
    #   first = m & ~(earlier mate matched)  (lexicographic window order,
    #            composed per axis: earlier-w same (d,h); earlier-h any w;
    #            earlier-d any (h,w))
    #   dx    = first ? dy↑ : 0
    up = lambda t: jnp.repeat(
        jnp.repeat(jnp.repeat(t, 2, 2), 2, 3), 2, 4
    )
    m = x == up(y)
    a_w = _pair_prev(m, 4)
    p_w = m | _pair_mate(m, 4)
    a_h = _pair_prev(p_w, 3)
    p_h = p_w | _pair_mate(p_w, 3)
    a_d = _pair_prev(p_h, 2)
    first = m & ~(a_w | a_h | a_d)
    dx = jnp.where(first, up(dy), jnp.zeros((), dy.dtype)).astype(x.dtype)
    return (dx,)


_max_pool2_custom.defvjp(_max_pool2_fwd, _max_pool2_bwd)


def _interp_matrix_align_corners(n_in: int, n_out: int) -> np.ndarray:
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    w_hi = pos - lo
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    mat[np.arange(n_out), lo] += 1.0 - w_hi
    mat[np.arange(n_out), hi] += w_hi
    return mat.astype(np.float32)


def resize_trilinear_planes(x, out_dhw):
    """Trilinear x2 resize (align_corners=True) of (B, C, D, H, W) — three
    per-axis MXU matmuls (`unet/unet3d.py:47` nn.Upsample equivalent)."""
    _, _, d, h, w = x.shape
    od, oh, ow = out_dhw
    md = jnp.asarray(_interp_matrix_align_corners(d, od))
    mh = jnp.asarray(_interp_matrix_align_corners(h, oh))
    mw = jnp.asarray(_interp_matrix_align_corners(w, ow))
    x = jnp.einsum("Dd,bcdhw->bcDhw", md, x, preferred_element_type=x.dtype)
    x = jnp.einsum("Hh,bcdhw->bcdHw", mh, x, preferred_element_type=x.dtype)
    x = jnp.einsum("Ww,bcdhw->bcdhW", mw, x, preferred_element_type=x.dtype)
    return x


class UNet3d(nn.Module):
    """in_channels -> in_channels, width n_channels (reference uses 1 -> 4).

    External API stays channels-last (B, D, H, W, C); pass ``train=True``
    from training steps so convs keep the differentiable XLA path."""

    in_channels: int = 1
    n_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, D, H, W, in_channels)
        n = self.n_channels
        # Round 3: the convs go through StencilConv3 -> conv3_planes_diff
        # (custom VJP), so the kernel path stays on for training as well.
        use_pallas = pallas_enabled()
        dc = lambda f, name: DoubleConv(f, dtype=self.dtype, name=name)

        xp = jnp.transpose(x, (0, 4, 1, 2, 3))  # planes

        x1 = dc(n, "conv")(xp, use_pallas)
        x2 = dc(2 * n, "enc1")(max_pool2_planes(x1), use_pallas)
        x3 = dc(4 * n, "enc2")(max_pool2_planes(x2), use_pallas)
        x4 = dc(8 * n, "enc3")(max_pool2_planes(x3), use_pallas)
        x5 = dc(8 * n, "enc4")(max_pool2_planes(x4), use_pallas)

        def up(lo, skip, f, name):
            # Trilinear x2 upsample, centre-pad to the skip's shape, concat.
            # (unet/unet3d.py:53-62)
            lo = resize_trilinear_planes(
                lo, (2 * lo.shape[2], 2 * lo.shape[3], 2 * lo.shape[4])
            )
            pads = [(0, 0), (0, 0)]
            for ax in (2, 3, 4):
                diff = skip.shape[ax] - lo.shape[ax]
                pads.append((diff // 2, diff - diff // 2))
            lo = jnp.pad(lo, pads)
            return dc(f, name)(
                jnp.concatenate([skip, lo], axis=1), use_pallas
            )

        out = up(x5, x4, 4 * n, "dec1")
        out = up(out, x3, 2 * n, "dec2")
        out = up(out, x2, n, "dec3")
        out = up(out, x1, n, "dec4")

        # 1x1x1 out conv (`unet/unet3d.py:65-70`); 'out' scope keeps the
        # round-1 nn.Conv param names so checkpoints restore unchanged.
        y = OutConv1x1(
            self.in_channels, dtype=self.dtype, name="out"
        )(out)
        return jnp.transpose(y, (0, 2, 3, 4, 1))


class OutConv1x1(nn.Module):
    """1x1x1 conv on planes layout; params match nn.Conv ('kernel' of shape
    (1, 1, 1, C_in, C_out), 'bias')."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        cin = xp.shape[1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, 1, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum(
            "bcdhw,co->bodhw", xp.astype(self.dtype),
            kernel[0, 0, 0].astype(self.dtype),
        )
        return y + bias.astype(y.dtype)[None, :, None, None, None]
