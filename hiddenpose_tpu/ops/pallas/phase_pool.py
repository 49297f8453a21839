"""Pallas TPU kernels for the s2d-space phase max-pool (MaxPool3d k3 s2 p1
evaluated on the space-to-depth conv output — `ops/space_to_depth.py::
phase_maxpool_k3s2`).

Why: the XLA lowering of the separable 9-slice max chain materialises every
stage of the (B, 64^3, 512) phase tensor in HBM — measured 16.9 ms forward
and 63.9 ms backward at the production stem shape (vs a ~2 GB traffic
roofline of ~3 ms).  These kernels do the whole reduction (and its exact
VJP, including XLA's 0.5/0.5 tie-splitting max semantics) in VMEM.

Layout: y2 is (B, D2, H2, W2, 8C) channels-last, phase-major lanes
(lane = ((pd*2+ph)*2+pw)*C + c).  The three per-axis candidate sets
  (block m, phase 0), (block m, phase 1), (block m-1, phase 1)
are addressed WITHOUT lane-splitting: phase bit pw/ph/pd lives at lane
offset C/2C/4C, so `pltpu.roll` over the (multi-tile) lane axis aligns
phase-1 values over phase-0 positions, and the block-(m-1) shifts are a
sublane roll (W), a row offset (H) and a plane offset (D).  Only lanes
< C of the result are meaningful; the kernel masks lanes [C, 128) to zero
and stores the first (tile-aligned) 128-lane group, which the host-side
wrapper slices to C.

Reference semantics: `/root/reference/models/posenet3d_50.py:207-214`
(conv7 stem -> BN -> ReLU -> MaxPool3d(3, 2, 1)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hiddenpose_tpu.ops.pallas.conv3p import on_tpu_default_device

NEG = float(jnp.finfo(jnp.float32).min)


def _roll_lanes(t, off):
    """out[l] = t[l + off] (lane axis, wrap-around; wrapped values land in
    lanes that are never read)."""
    return pltpu.roll(t, t.shape[-1] - off, 1)


def _shift_w(t, mask0):
    """out[w] = t[w - 1] along sublanes with -inf at w = 0 (the m-1
    candidate of output block 0 lies outside the volume)."""
    rolled = pltpu.roll(t, 1, 0)
    return jnp.where(mask0, NEG, rolled)


def _wred(row, c, mask0):
    """W-axis 3-candidate max for one (W2, 8C) row; valid at pw=0 lanes."""
    a1 = _roll_lanes(row, c)
    return jnp.maximum(jnp.maximum(row, a1), _shift_w(a1, mask0))


def _hred(wc, whm, c):
    """H-axis reduce from cached W-stage rows mh (wc) and mh-1 (whm)."""
    return jnp.maximum(
        jnp.maximum(wc, _roll_lanes(wc, 2 * c)), _roll_lanes(whm, 2 * c)
    )


def _phase_pool_fwd_kernel(y_hbm, o_ref, y_tile, w_tile, sem_y, *, td, nd,
                           d2, h2, w2, c, lanes):
    """Forward pool.  Grid (B, nd); y_tile holds td+1 input planes (front
    halo = plane md-1, -inf at the volume front); w_tile caches the W-stage
    of every row of the tile (computed once per row)."""
    bi = pl.program_id(0)
    i = pl.program_id(1)

    base = pl.multiple_of(bi * d2, d2)
    if nd == 1:
        dma = pltpu.make_async_copy(
            y_hbm.at[pl.ds(base, td), :, :, :], y_tile.at[1:td + 1], sem_y,
        )
        dma.start()
        dma.wait()
        y_tile[0] = jnp.full((h2, w2, lanes), NEG, jnp.float32)
    else:
        @pl.when(i == 0)
        def _():
            dma = pltpu.make_async_copy(
                y_hbm.at[pl.ds(base, td), :, :, :], y_tile.at[1:td + 1],
                sem_y,
            )
            dma.start()
            dma.wait()
            y_tile[0] = jnp.full((h2, w2, lanes), NEG, jnp.float32)

        @pl.when(i > 0)
        def _():
            dma = pltpu.make_async_copy(
                y_hbm.at[pl.ds(base + i * td - 1, td + 1), :, :, :],
                y_tile, sem_y,
            )
            dma.start()
            dma.wait()

    mask0 = jax.lax.broadcasted_iota(jnp.int32, (w2, lanes), 0) == 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (w2, lanes), 1)
    out_mask = lane < c

    # Pass 1: W-stage for every row of every plane in the tile.
    def wpass(k, carry):
        dz = k // h2
        mh = k - dz * h2
        row = y_tile[dz, pl.ds(mh, 1)][0]
        w_tile[dz, pl.ds(mh, 1)] = _wred(row, c, mask0)[None]
        return carry

    jax.lax.fori_loop(0, (td + 1) * h2, wpass, 0)

    # Pass 2: H + D stages per output row.
    def body(k, carry):
        dloc = k // h2
        mh = k - dloc * h2
        mh_m = jnp.maximum(mh - 1, 0)
        neg = jnp.full((w2, lanes), NEG, jnp.float32)

        wc_cur = w_tile[dloc + 1, pl.ds(mh, 1)][0]
        whm_cur = jnp.where(mh == 0, neg, w_tile[dloc + 1, pl.ds(mh_m, 1)][0])
        wc_prv = w_tile[dloc, pl.ds(mh, 1)][0]
        whm_prv = jnp.where(mh == 0, neg, w_tile[dloc, pl.ds(mh_m, 1)][0])

        hc = _hred(wc_cur, whm_cur, c)
        hp = _hred(wc_prv, whm_prv, c)
        out = jnp.maximum(
            jnp.maximum(hc, _roll_lanes(hc, 4 * c)), _roll_lanes(hp, 4 * c)
        )
        out = jnp.where(out_mask, out, 0.0)
        # lax.slice, not out[:, :128]: mixed newaxis+slice indexing lowers
        # to a gather, which Mosaic rejects; the explicit first-lane-tile
        # slice is tile-aligned and legal.
        res = jax.lax.slice(out, (0, 0), (w2, 128))
        o_ref[dloc, pl.ds(mh, 1)] = res[None].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, td * h2, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def phase_maxpool_pallas(y2: jax.Array, *, interpret: bool | None = None):
    """Pallas phase max-pool forward.  y2 (B, D2, H2, W2, 8C) -> pooled
    (B, D2, H2, W2, C).  Requires 8C % 128 == 0 and W2 % 8 == 0."""
    b, d2, h2, w2, lanes = y2.shape
    c = lanes // 8
    assert lanes % 128 == 0 and w2 % 8 == 0, y2.shape

    td = max(t for t in (16, 8, 4, 2, 1) if d2 % t == 0
             and (2 * t + 3) * h2 * w2 * lanes * 4 <= 80 * 1024 * 1024)
    nd = d2 // td

    if interpret is None:
        interpret = not on_tpu_default_device()

    kern = functools.partial(
        _phase_pool_fwd_kernel, td=td, nd=nd, d2=d2, h2=h2, w2=w2, c=c,
        lanes=lanes,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, nd),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (td, h2, w2, 128), lambda bi, i: (bi * nd + i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * d2, h2, w2, 128), y2.dtype),
        scratch_shapes=[
            pltpu.VMEM((td + 1, h2, w2, lanes), jnp.float32),
            pltpu.VMEM((td + 1, h2, w2, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=9 * y2.size,
            bytes_accessed=y2.size * 4 + b * d2 * h2 * w2 * 128 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y2.astype(jnp.float32).reshape(b * d2, h2, w2, lanes))
    return out.reshape(b, d2, h2, w2, 128)[..., :c]


def _tie_w(a, b):
    """XLA max-gradient branch weight: 1 where a > b, 0.5 at ties, else 0
    (matches lax.max's 0.5/0.5 tie splitting, so the Pallas VJP matches
    autodiff of the slice-chain forward to accumulation order — 1-2 ulp
    where a source element feeds several outputs)."""
    return jnp.where(a > b, 1.0, jnp.where(a < b, 0.0, 0.5))


def _shift_w_adj(t, mask_last):
    """Adjoint of `_shift_w`: out[w] = t[w + 1], zero at w = W2-1 (the -inf
    fill is a constant, no gradient)."""
    rolled = pltpu.roll(t, t.shape[0] - 1, 0)
    return jnp.where(mask_last, 0.0, rolled)


def _phase_pool_bwd_kernel(y_hbm, g_hbm, dy_hbm, ybuf, wbuf, dwbuf, dybuf,
                           gbuf, sem_y, sem_g, sem_o, *, d2, h2, w2, c,
                           lanes):
    """VJP of the phase pool.  Grid (B,); inside, a streaming loop over the
    D2 planes with a 2-plane window:

      step md:  load y2[md], g[md]; W-stage cache for plane md;
                route the D+H stages of OUTPUT plane md, accumulating
                W-stage cotangents into dwbuf[md] (s=0 candidates) and
                dwbuf[md-1] (the s=1, pd=1 candidates);
                plane md-1's W cotangent is then complete -> route the W
                stage against ybuf[md-1] and DMA dy[md-1] out.

    Every path from the output to y2 factors through the W stage, so dy of
    a plane needs no cross-step accumulation."""
    bi = pl.program_id(0)
    base = pl.multiple_of(bi * d2, d2)

    mask0 = jax.lax.broadcasted_iota(jnp.int32, (w2, lanes), 0) == 0
    mask_last = (
        jax.lax.broadcasted_iota(jnp.int32, (w2, lanes), 0) == w2 - 1
    )
    zero_row = jnp.zeros((w2, lanes), jnp.float32)
    neg = jnp.full((w2, lanes), NEG, jnp.float32)

    def dma_in(md, s):
        d1 = pltpu.make_async_copy(
            y_hbm.at[pl.ds(base + md, 1), :, :, :], ybuf.at[pl.ds(s, 1)],
            sem_y,
        )
        d2_ = pltpu.make_async_copy(
            g_hbm.at[pl.ds(base + md, 1), :, :, :], gbuf, sem_g,
        )
        d1.start()
        d2_.start()
        d1.wait()
        d2_.wait()

    def wroute_row(dw, a):
        """W-stage VJP for one row: cotangent dw, primal row a."""
        a1 = _roll_lanes(a, c)
        a1m = _shift_w(a1, mask0)
        m_w = jnp.maximum(a, a1)
        g_mw = dw * _tie_w(m_w, a1m)
        g_a1m = dw * _tie_w(a1m, m_w)
        d_a1 = g_mw * _tie_w(a1, a) + _shift_w_adj(g_a1m, mask_last)
        return g_mw * _tie_w(a, a1) + pltpu.roll(d_a1, c, 1)

    def hroute(dh, wc, whm):
        """H-stage VJP: upstream dh -> (d_wc_row, d_whm_row)."""
        wc2 = _roll_lanes(wc, 2 * c)
        whm2 = _roll_lanes(whm, 2 * c)
        m_h = jnp.maximum(wc, wc2)
        g_mh = dh * _tie_w(m_h, whm2)
        g_whm2 = dh * _tie_w(whm2, m_h)
        d_wc = g_mh * _tie_w(wc, wc2) + pltpu.roll(
            g_mh * _tie_w(wc2, wc), 2 * c, 1
        )
        return d_wc, pltpu.roll(g_whm2, 2 * c, 1)

    def step(md, carry):
        s = md % 2
        p = 1 - s
        dma_in(md, s)

        # W-stage cache + fresh cotangent plane for plane md.
        def wpass(mh, carry2):
            wbuf[s, pl.ds(mh, 1)] = _wred(
                ybuf[s, pl.ds(mh, 1)][0], c, mask0
            )[None]
            dwbuf[s, pl.ds(mh, 1)] = zero_row[None]
            return carry2

        jax.lax.fori_loop(0, h2, wpass, 0)

        # D+H routing of output plane md.
        def route(mh, carry2):
            mh_m = jnp.maximum(mh - 1, 0)
            wc_cur = wbuf[s, pl.ds(mh, 1)][0]
            whm_cur = jnp.where(mh == 0, neg, wbuf[s, pl.ds(mh_m, 1)][0])
            wc_prv = jnp.where(md == 0, neg, wbuf[p, pl.ds(mh, 1)][0])
            whm_prv = jnp.where(
                jnp.logical_or(md == 0, mh == 0), neg,
                wbuf[p, pl.ds(mh_m, 1)][0],
            )

            hc = _hred(wc_cur, whm_cur, c)
            hp = _hred(wc_prv, whm_prv, c)
            hc4 = _roll_lanes(hc, 4 * c)
            hp4 = _roll_lanes(hp, 4 * c)
            m_dc = jnp.maximum(hc, hc4)

            grow = gbuf[0, pl.ds(mh, 1)][0]  # (w2, 128), zeros past c
            gfull = grow if lanes == 128 else jnp.concatenate(
                [grow, jnp.zeros((w2, lanes - 128), jnp.float32)], axis=1
            )
            g_mdc = gfull * _tie_w(m_dc, hp4)
            d_hp = pltpu.roll(gfull * _tie_w(hp4, m_dc), 4 * c, 1)
            d_hc = g_mdc * _tie_w(hc, hc4) + pltpu.roll(
                g_mdc * _tie_w(hc4, hc), 4 * c, 1
            )

            d_wc_c, d_whm_c = hroute(d_hc, wc_cur, whm_cur)
            d_wc_p, d_whm_p = hroute(d_hp, wc_prv, whm_prv)

            dwbuf[s, pl.ds(mh, 1)] = (
                dwbuf[s, pl.ds(mh, 1)][0] + d_wc_c
            )[None]
            dwbuf[p, pl.ds(mh, 1)] = (
                dwbuf[p, pl.ds(mh, 1)][0] + d_wc_p
            )[None]

            @pl.when(mh > 0)
            def _():
                dwbuf[s, pl.ds(mh_m, 1)] = (
                    dwbuf[s, pl.ds(mh_m, 1)][0] + d_whm_c
                )[None]
                dwbuf[p, pl.ds(mh_m, 1)] = (
                    dwbuf[p, pl.ds(mh_m, 1)][0] + d_whm_p
                )[None]

            return carry2

        jax.lax.fori_loop(0, h2, route, 0)

        # Plane md-1's W cotangent is complete: route + flush.
        def wroute_pass(slot):
            def body(mh, carry2):
                dybuf[0, pl.ds(mh, 1)] = wroute_row(
                    dwbuf[slot, pl.ds(mh, 1)][0],
                    ybuf[slot, pl.ds(mh, 1)][0],
                )[None]
                return carry2

            jax.lax.fori_loop(0, h2, body, 0)

        @pl.when(md > 0)
        def _():
            wroute_pass(p)
            out = pltpu.make_async_copy(
                dybuf, dy_hbm.at[pl.ds(base + md - 1, 1), :, :, :], sem_o,
            )
            out.start()
            out.wait()

        @pl.when(md == d2 - 1)
        def _():
            wroute_pass(s)
            out = pltpu.make_async_copy(
                dybuf, dy_hbm.at[pl.ds(base + md, 1), :, :, :], sem_o,
            )
            out.start()
            out.wait()

        return carry

    jax.lax.fori_loop(0, d2, step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def phase_maxpool_vjp_pallas(
    y2: jax.Array, g: jax.Array, *, interpret: bool | None = None
):
    """dL/dy2 of `phase_maxpool_pallas` given g = dL/d(pooled), with XLA's
    exact max tie-splitting semantics.  y2 (B, D2, H2, W2, 8C),
    g (B, D2, H2, W2, C) -> (B, D2, H2, W2, 8C) float32."""
    b, d2, h2, w2, lanes = y2.shape
    c = lanes // 8
    assert g.shape == (b, d2, h2, w2, c), (g.shape, y2.shape)
    assert lanes % 128 == 0 and w2 % 8 == 0

    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, 0),) * 4 + ((0, 128 - c),)) if c < 128 \
        else g.astype(jnp.float32)

    if interpret is None:
        interpret = not on_tpu_default_device()

    kern = functools.partial(
        _phase_pool_bwd_kernel, d2=d2, h2=h2, w2=w2, c=c, lanes=lanes,
    )
    plane = h2 * w2 * lanes * 4
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # y2
            pl.BlockSpec(memory_space=pl.ANY),  # g (128-lane padded)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # dy (manual DMA)
        out_shape=jax.ShapeDtypeStruct((b * d2, h2, w2, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, h2, w2, lanes), jnp.float32),  # ybuf
            pltpu.VMEM((2, h2, w2, lanes), jnp.float32),  # wbuf
            pltpu.VMEM((2, h2, w2, lanes), jnp.float32),  # dwbuf
            pltpu.VMEM((1, h2, w2, lanes), jnp.float32),  # dybuf
            pltpu.VMEM((1, h2, w2, 128), jnp.float32),    # gbuf
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(7.2 * plane) + 8 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * y2.size,
            bytes_accessed=2 * y2.size * 4 + g.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        y2.astype(jnp.float32).reshape(b * d2, h2, w2, lanes),
        gp.reshape(b * d2, h2, w2, 128),
    )
    return out.reshape(b, d2, h2, w2, lanes)


@jax.custom_vjp
def phase_maxpool_diff(y2: jax.Array) -> jax.Array:
    """Differentiable Pallas phase max-pool (TPU train path)."""
    return phase_maxpool_pallas(y2)


def _pmp_fwd(y2):
    return phase_maxpool_pallas(y2), y2


def _pmp_bwd(y2, g):
    return (phase_maxpool_vjp_pallas(y2, g).astype(y2.dtype),)


phase_maxpool_diff.defvjp(_pmp_fwd, _pmp_bwd)
