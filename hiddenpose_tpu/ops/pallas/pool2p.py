"""Pallas TPU kernel for the UNet max-pool (k2 s2) backward on the
channels-planes layout.

Why: the elementwise XLA formulation (`models/unet3d.py::_max_pool2_bwd`)
is algebraically minimal but its rolls/parity-selects lower to HBM-level
slice+concat pairs at the planes layout — the round-4 profile
(BENCH_NOTES "UNet grad profiled", scripts/tpu_diag_unet.py) attributes
40 of the UNet gradient's async slice DMAs to that roll chain, each
2-3.5 ms and barely overlapped.  Here the whole routing runs in VMEM: the
only HBM traffic is one read of x, one read of dy, one write of dx
(~4.25 plane-equivalents per output-plane pair vs the XLA version's
many-pass materialisation).

Semantics: EXACTLY `_max_pool2_bwd` — the cotangent goes to the FIRST
maximal element in row-major (d, h, w) window order, matching XLA's
`select_and_scatter` including all tie cases (pinned by
tests/test_unet3d.py).  The window max is recomputed in-kernel from x
(cheaper than DMA-ing y back in), and the dy upsample uses 0/1 selection
matmuls at `Precision.HIGHEST`, which is exact for f32 (bf16x3 splitting
reconstructs every mantissa bit against exact-0/1 operands), so the
kernel is bit-identical to the XLA path.

Pooling windows are non-overlapping, so there are no halos: plain
BlockSpec pipelining (no manual DMA choreography) moves the tiles.
Sub-128-lane levels (the UNet pools at W = 128/64/32/16) are zero-padded
to a full lane tile host-side, like `conv3p.py` — Mosaic requires
HBM-slice lane extents aligned to the 128 tiling.

Reference semantics: `/root/reference/unet/unet3d.py:31-36`
(nn.MaxPool3d(2, 2) inside Down) whose autograd is select_and_scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hiddenpose_tpu.ops.pallas.conv3p import on_tpu_default_device


def _pair_max(t, axis):
    """max within non-overlapping index pairs along `axis`, broadcast back
    to both elements: out[2k] = out[2k+1] = max(t[2k], t[2k+1])."""
    n = t.shape[axis]
    fwd = pltpu.roll(t, n - 1, axis)  # t[i+1]
    bwd = pltpu.roll(t, 1, axis)      # t[i-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, axis)
    mate = jnp.where(idx % 2 == 0, fwd, bwd)
    return jnp.maximum(t, mate)


def _pair_prev(t, axis):
    """earlier-mate value of an f32 0/1 mask: out[2k] = 0, out[2k+1] = t[2k].

    Masks stay f32 throughout the kernel: Mosaic's dynamic_rotate (the
    lowering of pltpu.roll) only supports 32-bit element types — the
    bool-mask version of this algebra failed hardware compile with
    "not implemented: Rotate with non-32-bit data" (round-5 job 129b).
    0/1 f32 products/maxima are exact, so the routing is unchanged."""
    bwd = pltpu.roll(t, 1, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, axis)
    return jnp.where(idx % 2 == 1, bwd, jnp.zeros((), jnp.float32))


def _pool2_bwd_kernel(x_ref, g_ref, dx_ref, *, td, h, w):
    """One tile: td output planes = 2*td input planes of (h, w=128 padded).

    Per output plane m: recompute the window max in input layout
    (pairwise-max along w, h, then across the two planes), build the
    first-match mask with the same per-axis pair-prefix algebra as
    `_max_pool2_bwd`, and multiply by the upsampled dy plane."""
    # 0/1 selection matrices for the exact dy upsample (built once; iota
    # compares are cheap and Mosaic hoists them out of the loop).
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, h // 2), 0)
    hj = jax.lax.broadcasted_iota(jnp.int32, (h, h // 2), 1)
    eh = (hj == hh // 2).astype(jnp.float32)          # (h, h/2)
    # ew contracts over g's (lane-padded) w axis: rows >= w/2 are all-zero.
    wj = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    ew = (wj == ww // 2).astype(jnp.float32)          # (w, w)

    def body(m, carry):
        x0 = x_ref[pl.ds(2 * m, 1)][0]        # (h, w)
        x1 = x_ref[pl.ds(2 * m + 1, 1)][0]
        g = g_ref[pl.ds(m, 1)][0]             # (h/2, w/2)

        # Window max broadcast to every input position.
        xw0 = _pair_max(x0, 1)
        xw1 = _pair_max(x1, 1)
        xh0 = _pair_max(xw0, 0)
        xh1 = _pair_max(xw1, 0)
        up_y = jnp.maximum(xh0, xh1)

        # dy upsampled to input layout — exact (see module docstring).
        up_dy = jnp.dot(
            eh,
            jnp.dot(g, ew, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        def first_match(xm, a_d):
            # f32 0/1 mask algebra (see _pair_prev): pair-OR is _pair_max
            # on 0/1 values; AND-NOT chains are exact products.
            mm = (xm == up_y).astype(jnp.float32)
            a_w = _pair_prev(mm, 1)
            p_w = _pair_max(mm, 1)
            a_h = _pair_prev(p_w, 0)
            p_h = _pair_max(p_w, 0)
            first = mm * (1.0 - a_w) * (1.0 - a_h) * (1.0 - a_d)
            return first, p_h

        first0, p_h0 = first_match(x0, jnp.zeros((h, w), jnp.float32))
        first1, _ = first_match(x1, p_h0)

        dx_ref[pl.ds(2 * m, 1)] = (first0 * up_dy)[None]
        dx_ref[pl.ds(2 * m + 1, 1)] = (first1 * up_dy)[None]
        return carry

    jax.lax.fori_loop(0, td, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pool2_bwd_planes_pallas(x: jax.Array, dy: jax.Array, *,
                            interpret: bool | None = None) -> jax.Array:
    """dL/dx of MaxPool3d(2,2) on (B, C, D, H, W) given dy on the pooled
    volume, first-match (select_and_scatter) semantics.  Requires even
    D/H/W, H % 16 == 0, W % 16 == 0, W <= 128."""
    b, c, d, h, w = x.shape
    assert dy.shape == (b, c, d // 2, h // 2, w // 2), (x.shape, dy.shape)
    assert d % 2 == 0 and h % 16 == 0 and w % 16 == 0 and w <= 128, x.shape

    if interpret is None:
        interpret = not on_tpu_default_device()

    xf = x.astype(jnp.float32).reshape(b * c * d, h, w)
    gf = dy.astype(jnp.float32).reshape(b * c * d // 2, h // 2, w // 2)
    wp = 128
    if w < wp:
        # Host-side lane pad (Mosaic tiling); the padded region is exact:
        # x=0 there gives up_y=0, first can be true, but up_dy=0.
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, wp - w)))
        gf = jnp.pad(gf, ((0, 0), (0, 0), (0, wp - w // 2)))
    else:
        gf = jnp.pad(gf, ((0, 0), (0, 0), (0, wp - w // 2)))

    # Output-plane tile depth: bounded by VMEM (x + dx tiles at 2*td
    # planes each, dy at td quarter-planes, x2 for pipelining).
    plane = h * wp * 4
    td = max(t for t in (16, 8, 4, 2, 1)
             if (d // 2) % t == 0 and 9 * t * plane <= 12 * 1024 * 1024)
    n = b * c * d // (2 * td)

    kern = functools.partial(_pool2_bwd_kernel, td=td, h=h, w=wp)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((2 * td, h, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((td, h // 2, wp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2 * td, h, wp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * c * d, h, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * x.size,
            bytes_accessed=x.size * 8 + dy.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, gf)
    if w < wp:
        out = out[:, :, :w]
    return out.reshape(b, c, d, h, w).astype(x.dtype)
