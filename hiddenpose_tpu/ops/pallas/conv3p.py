"""Pallas TPU kernel: small-channel 3x3x3 stride-1 stencil convolution.

Why it exists: XLA lowers a spatial conv as one matmul per kernel tap with
C_in as the MXU contraction dim; at the 1-8 channels of this pipeline's
volumes that leaves the MXU ~1% utilised and a 128^3 conv3^3 C1→C1 costs
~4.4 ms of device time for ~80 µs of roofline traffic (measured,
scripts/perf_probe.py; all numbers net of the ~1.6 ms per-program relay
overhead).  This kernel computes the stencil on the VPU instead: channels-
planes layout (B, C, D, H, W) with W in lanes and H in sublanes, one fused
multiply-accumulate of a shifted (H, W) tile per (tap, c_in, c_out).

Fusions: input affine + ReLU (a GroupNorm/BN whose statistics were computed
by the previous op can ride along for free), bias add, output activation
(relu / leaky-0.2), residual add — covering `ResConv3D`
(`/root/reference/models/ops.py:7-38`), the FeatureExtraction branches
(`models/feature_extraction.py:122-171`) and the UNet DoubleConv bodies
(`/root/reference/unet/unet3d.py:11-45`).

Hardware notes for this Mosaic toolchain (probed by bisection):
* a manual async DMA whose destination sublane (second-minor) extent is not
  a multiple of 8 FAULTS the TPU worker — so the tile keeps the full
  (aligned) H extent and all halos are handled without padded buffers;
* D halos: three `pl.when` branches (first / interior / last grid step)
  issue static-shape DMAs into static leading-dim offsets of the scratch,
  with the boundary plane zero-filled ('zero' pad) or copied from the edge
  plane ('edge' pad);
* H and W halos: `pltpu.roll` over sublanes / lanes plus boundary masks
  (zero) or edge-row/column broadcasts (edge);
* per-program dispatch costs ~1.6 ms on the relay — so the grid is kept
  small (large depth tiles) and callers should fuse as much as possible
  into one launch.

Training (round 3): `conv3_planes_diff` wraps the forward kernel in a
`jax.custom_vjp` whose input-gradient is the SAME stencil structure with
adjoint shifts (`_conv3p_adj_kernel`) — the transpose of a 3^3 stencil is a
3^3 stencil over the flipped taps with zero-fill shifts plus boundary
accumulation terms for the edge-pad case — and whose weight-gradient rides
XLA's conv transpose rule.  Modules can therefore keep the Pallas path on
in training instead of falling back to XLA convs (round-2 VERDICT missing
#2: the train step ran every hot conv un-kernelled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def on_tpu_default_device() -> bool:
    """True when uncommitted computations run on a TPU.

    Honors a pinned ``jax_default_device`` (the test suite pins CPU even
    though a TPU plugin owns the higher-priority backend)."""
    pinned = jax.config.jax_default_device
    if pinned is not None:
        return pinned.platform == "tpu"
    return jax.default_backend() == "tpu"


def kernel_dot_precision():
    """Precision for dots INSIDE Pallas kernels, honoring the ambient
    `jax.default_matmul_precision` without crashing Mosaic.

    Mosaic lowers only DEFAULT (one bf16 pass) and HIGHEST (multi-pass);
    an ambient 'high' context leaking into an unqualified in-kernel
    jnp.dot raises `NotImplementedError: Unsupported dot precision: HIGH`
    at trace time (hit by the round-5 precision attribution, tpu_jobs/
    135a — a user running the model under `with
    jax.default_matmul_precision('high')` would crash the same way).
    Resolved at kernel-trace time: high/highest/float32 escalate to
    HIGHEST (the quality the caller asked for), everything else pins
    DEFAULT (the kernels' documented bf16-pass contract)."""
    amb = jax.config.jax_default_matmul_precision
    if amb in ("high", "highest", "float32", "tensorfloat32"):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def pallas_enabled() -> bool:
    """Module gate for the hardware kernels: on-TPU AND not disabled via
    HP_NO_PALLAS=1 (diagnostic A/B switch; read at trace time)."""
    import os

    return (
        os.environ.get("HP_NO_PALLAS", "0") != "1" and on_tpu_default_device()
    )


def _db_enabled() -> bool:
    """Gate for the double-buffered forward kernel (round-3 VERDICT #5):
    prefetches the next depth tile's DMA while the current tile computes.
    Read at trace time; HP_CONV3P_DB=0 falls back to the blocking-DMA
    kernel for A/B measurement."""
    import os

    return os.environ.get("HP_CONV3P_DB", "1") != "0"


def _kdma_enabled() -> bool:
    """Gate for kernel-side depth halos in the double-buffered kernels
    (round-5 VERDICT #2: absorb the halo extraction into the kernels).

    The db kernels historically required the wrapper to materialise a
    depth-halo-padded COPY of the activation (one XLA pad per call — a
    full HBM write+read of every conv/adjoint/wgrad operand, the
    'halo slice-start pairs' of the round-4 UNet-grad profile).  With
    kdma the prefetched DMA itself carries first/interior/last branches
    reading the unpadded tensor (the conv3mxu pattern) and the boundary
    planes are filled in-scratch, so the host copy disappears.  Read at
    trace time; HP_CONV3P_KDMA=0 restores the host-pad path.

    Default ON: on-chip validation (scripts/tpu_validate_kdma.py,
    tpu_jobs/1515-1516) measured bit-exactness at every model shape and
    wins across the board — standalone up to 1.83x (stem-shape wgrad
    4.17 -> 2.28 ms, fwd 2.62 -> 1.54 ms), composed UNet grad
    44.2 -> 42.1 ms, full infer 29.20 -> 29.72 vol/s, train
    5.36 -> 5.38 vol/s."""
    import os

    return os.environ.get("HP_CONV3P_KDMA", "1") == "1"


def _make_masks(h, w, wl, pad_mode):
    """Boundary masks, built ONCE per kernel invocation (a fresh iota per
    shift measurably slows Mosaic's generated code).

    ``w`` is the physical lane extent of the tile, ``wl`` the LOGICAL
    volume width: sub-128-lane volumes are zero-padded to a full 128-lane
    tile host-side (Mosaic requires HBM slice lane extents aligned to the
    128 tiling), and every boundary lives at lane wl-1."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    return {
        "l0": lane == 0, "lw": lane == wl - 1,
        "r0": row == 0, "rh": row == h - 1,
    }


def _shift_lane(t, step, pad_mode, wl, masks):
    """Tap offset `step` ∈ {-1, +1} along lanes: value at lane l becomes
    input at lane l+step, SAME boundary semantics at LOGICAL width wl."""
    if step == -1:
        rolled = pltpu.roll(t, 1, 1)
        fill = (jnp.broadcast_to(t[:, 0:1], t.shape) if pad_mode == "edge"
                else jnp.zeros_like(t))
        return jnp.where(masks["l0"], fill, rolled)
    rolled = pltpu.roll(t, t.shape[1] - 1, 1)
    fill = (jnp.broadcast_to(t[:, wl - 1:wl], t.shape) if pad_mode == "edge"
            else jnp.zeros_like(t))
    return jnp.where(masks["lw"], fill, rolled)


def _shift_sub(t, step, pad_mode, h, masks):
    """Tap offset `step` ∈ {-1, +1} along sublanes (H axis)."""
    if step == -1:
        rolled = pltpu.roll(t, 1, 0)
        fill = (jnp.broadcast_to(t[0:1, :], t.shape) if pad_mode == "edge"
                else jnp.zeros_like(t))
        return jnp.where(masks["r0"], fill, rolled)
    rolled = pltpu.roll(t, t.shape[0] - 1, 0)
    fill = (jnp.broadcast_to(t[h - 1:h, :], t.shape) if pad_mode == "edge"
            else jnp.zeros_like(t))
    return jnp.where(masks["rh"], fill, rolled)


def _conv3p_kernel(x_hbm, k_ref, aff_ref, r_hbm, o_ref, x_tile, r_tile,
                   sem_x, sem_r, *, cin, cout, td, nd, h, w, wl, act,
                   pad_mode, has_residual, pre_relu, d_total):
    bi = pl.program_id(0)
    i = pl.program_id(1)

    # --- D-halo DMA: tile plane dz holds global plane i*td + dz - 1. ---
    def _fill_front():
        for ci in range(cin):
            x_tile[ci, 0] = (x_tile[ci, 1] if pad_mode == "edge"
                             else jnp.zeros((h, w), jnp.float32))

    def _fill_back():
        for ci in range(cin):
            x_tile[ci, td + 1] = (x_tile[ci, td] if pad_mode == "edge"
                                  else jnp.zeros((h, w), jnp.float32))

    # x_hbm is (B*C_in, D, H, W): 4D refs everywhere — Mosaic on this
    # toolchain rejects dynamic slices of 5D VMEM refs whose lane extent is
    # < 128 (round-2 finding), and folding batch into the channel leading
    # dim costs nothing (leading-dim merges are free reshapes).
    bc = pl.multiple_of(bi * cin, cin)
    if nd == 1:
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(bc, cin), pl.ds(0, td), :, :],
            x_tile.at[:, 1:td + 1],
            sem_x,
        )
        dma.start()
        dma.wait()
        _fill_front()
        _fill_back()
    else:
        @pl.when(jnp.logical_and(i > 0, i < nd - 1))
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(bc, cin), pl.ds(i * td - 1, td + 2), :, :],
                x_tile,
                sem_x,
            )
            dma.start()
            dma.wait()

        @pl.when(i == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(bc, cin), pl.ds(0, td + 1), :, :],
                x_tile.at[:, 1:td + 2], sem_x,
            )
            dma.start()
            dma.wait()
            _fill_front()

        @pl.when(i == nd - 1)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(bc, cin), pl.ds(d_total - td - 1, td + 1), :, :],
                x_tile.at[:, 0:td + 1], sem_x,
            )
            dma.start()
            dma.wait()
            _fill_back()

    if has_residual:
        rdma = pltpu.make_async_copy(
            r_hbm.at[pl.ds(pl.multiple_of(bi * cout, cout), cout),
                     pl.ds(i * td, td), :, :],
            r_tile, sem_r,
        )
        rdma.start()
        rdma.wait()

    # --- optional fused input affine (+ReLU): x <- act(x * a[ci] + b[ci])
    if pre_relu is not None:
        for ci in range(cin):
            for dz in range(td + 2):
                t = x_tile[ci, dz] * aff_ref[0, ci] + aff_ref[1, ci]
                if pre_relu:
                    t = jnp.maximum(t, 0.0)
                x_tile[ci, dz] = t

    # --- stencil ---
    # fori_loop over the depth rows: the body ((ci, dd, ww, hh, co)
    # unrolled, <= 27*cin*cout tile FMAs) is compiled ONCE — a fully
    # unrolled td x 27 x cin x cout kernel took minutes of Mosaic compile
    # time at production shapes (measured 234 s for td=16, c1->4).
    masks = _make_masks(h, w, wl, pad_mode)

    def body(dloc, carry):
        accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cout)]
        for ci in range(cin):
            for dd in range(3):
                plane = x_tile[ci, pl.ds(dloc + dd, 1)][0]
                for ww in range(3):
                    if ww == 1:
                        wv = plane
                    else:
                        wv = _shift_lane(plane, ww - 1, pad_mode, wl, masks)
                    for hh in range(3):
                        if hh == 1:
                            hv = wv
                        else:
                            hv = _shift_sub(wv, hh - 1, pad_mode, h, masks)
                        for co in range(cout):
                            kv = k_ref[((dd * 3 + hh) * 3 + ww) * cin + ci,
                                       co]
                            accs[co] = accs[co] + hv * kv
        for co in range(cout):
            out = accs[co] + k_ref[27 * cin, co]  # bias row
            if has_residual:
                out = out + r_tile[co, pl.ds(dloc, 1)][0]
            if act == "relu":
                out = jnp.maximum(out, 0.0)
            elif act == "leaky":
                out = jnp.where(out >= 0.0, out, 0.2 * out)
            o_ref[co, pl.ds(dloc, 1)] = out[None].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, td, body, 0)


def _db_fill_halo(x_tile, soff, i, cin, td, nd, h, w, pad_mode):
    """Fill the boundary halo plane(s) of the consumed slot in-scratch
    (kdma mode): plane soff+0 on the first depth tile, soff+td+1 on the
    last — zero fill, or a copy of the adjacent real plane for 'edge'.
    Runs after the slot's DMA wait and BEFORE any fused pre-affine, so the
    semantics match the host-pad prolog exactly."""

    def _front():
        for ci in range(cin):
            x_tile[ci, pl.ds(soff, 1)] = (
                x_tile[ci, pl.ds(soff + 1, 1)] if pad_mode == "edge"
                else jnp.zeros((1, h, w), jnp.float32))

    def _back():
        for ci in range(cin):
            x_tile[ci, pl.ds(soff + td + 1, 1)] = (
                x_tile[ci, pl.ds(soff + td, 1)] if pad_mode == "edge"
                else jnp.zeros((1, h, w), jnp.float32))

    if nd == 1:
        _front()
        _back()
    else:
        pl.when(i == 0)(_front)
        pl.when(i == nd - 1)(_back)


def _conv3p_kernel_db(x_hbm, k_ref, aff_ref, r_hbm, o_ref, x_tile, r_tile,
                      sems, sem_r, *, cin, cout, td, nd, h, w, wl, act,
                      pad_mode, has_residual, pre_relu, kdma):
    """Double-buffered `_conv3p_kernel` (round-3 VERDICT #5).

    With ``kdma`` (round-5 VERDICT #2) the input is the UNPADDED
    (B*C_in, D, H, W) tensor and each grid step's prefetched DMA carries
    first/interior/last branches (static shapes under `pl.when`, the
    conv3mxu pattern); the boundary halo plane is filled in-scratch by the
    CONSUMING step after its wait — before the fused pre-affine, so the
    numerics match the host-pad path bit-for-bit.  Without ``kdma`` the
    input arrives depth-halo-padded HOST-side (D+2 planes, pad-mode
    semantics applied by the wrapper) and every grid step issues ONE
    fixed-shape DMA.  Either way the NEXT step's tile is prefetched while
    the current tile computes.  The two buffer slots live along the plane
    axis of one 4D scratch ((cin, 2*(td+2), h, w)): slot parity follows
    the flattened grid index, and all slot addressing is a single dynamic
    `pl.ds` on the second-major dim (the 5D-ref dynamic-slice Mosaic bug
    never enters).  Scratch and DMA semaphores persist across sequential
    grid steps on TPU, which is what lets a step wait on a copy its
    predecessor started."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    g = bi * nd + i
    total = pl.num_programs(0) * nd
    tp2 = td + 2

    def issue_dma(gg, slot, op):
        """Start (op='start') or wait (op='wait') the x-tile copy for
        flattened grid step ``gg`` into buffer ``slot``.  The wait
        re-executes the same branch with an identical descriptor, which
        on TPU blocks on the semaphore the start incremented."""
        bb = gg // nd
        ii = gg - bb * nd
        bc = pl.ds(pl.multiple_of(bb * cin, cin), cin)
        if not kdma:
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds(ii * td, tp2), :, :],
                x_tile.at[:, pl.ds(slot * tp2, tp2)],
                sems.at[slot],
            )
            getattr(dma, op)()
            return
        if nd == 1:
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds(0, td), :, :],
                x_tile.at[:, pl.ds(slot * tp2 + 1, td)],
                sems.at[slot],
            )
            getattr(dma, op)()
            return

        @pl.when(ii == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds(0, td + 1), :, :],
                x_tile.at[:, pl.ds(slot * tp2 + 1, td + 1)],
                sems.at[slot],
            )
            getattr(dma, op)()

        @pl.when(jnp.logical_and(ii > 0, ii < nd - 1))
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds(ii * td - 1, tp2), :, :],
                x_tile.at[:, pl.ds(slot * tp2, tp2)],
                sems.at[slot],
            )
            getattr(dma, op)()

        @pl.when(ii == nd - 1)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds((nd - 1) * td - 1, td + 1), :, :],
                x_tile.at[:, pl.ds(slot * tp2, td + 1)],
                sems.at[slot],
            )
            getattr(dma, op)()

    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        issue_dma(g, slot, "start")

    @pl.when(g + 1 < total)
    def _():
        issue_dma(g + 1, nslot, "start")

    if has_residual:
        rdma = pltpu.make_async_copy(
            r_hbm.at[pl.ds(pl.multiple_of(bi * cout, cout), cout),
                     pl.ds(i * td, td), :, :],
            r_tile, sem_r,
        )
        rdma.start()

    issue_dma(g, slot, "wait")
    soff = slot * tp2

    if kdma:
        _db_fill_halo(x_tile, soff, i, cin, td, nd, h, w, pad_mode)

    if pre_relu is not None:
        for ci in range(cin):
            for dz in range(tp2):
                t = (x_tile[ci, pl.ds(soff + dz, 1)][0] * aff_ref[0, ci]
                     + aff_ref[1, ci])
                if pre_relu:
                    t = jnp.maximum(t, 0.0)
                x_tile[ci, pl.ds(soff + dz, 1)] = t[None]

    if has_residual:
        rdma.wait()

    masks = _make_masks(h, w, wl, pad_mode)

    def body(dloc, carry):
        accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cout)]
        for ci in range(cin):
            for dd in range(3):
                plane = x_tile[ci, pl.ds(soff + dloc + dd, 1)][0]
                for ww in range(3):
                    if ww == 1:
                        wv = plane
                    else:
                        wv = _shift_lane(plane, ww - 1, pad_mode, wl, masks)
                    for hh in range(3):
                        if hh == 1:
                            hv = wv
                        else:
                            hv = _shift_sub(wv, hh - 1, pad_mode, h, masks)
                        for co in range(cout):
                            kv = k_ref[((dd * 3 + hh) * 3 + ww) * cin + ci,
                                       co]
                            accs[co] = accs[co] + hv * kv
        for co in range(cout):
            out = accs[co] + k_ref[27 * cin, co]  # bias row
            if has_residual:
                out = out + r_tile[co, pl.ds(dloc, 1)][0]
            if act == "relu":
                out = jnp.maximum(out, 0.0)
            elif act == "leaky":
                out = jnp.where(out >= 0.0, out, 0.2 * out)
            o_ref[co, pl.ds(dloc, 1)] = out[None].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, td, body, 0)


def _adj_shift_lane(t, s, pad_mode, masks):
    """Adjoint of the forward lane tap shift: A_s(dz)[l] = dz[l - s] with
    ZERO fill, plus (edge pad) the boundary accumulation term — the
    transpose of `_shift_lane`'s edge-broadcast is a boundary add."""
    if s == 0:
        return t
    if s == -1:
        # A[l] = dz[l+1]; invalid at l = W-1; edge: + dz[0] at l = 0.
        rolled = pltpu.roll(t, t.shape[1] - 1, 1)
        res = jnp.where(masks["lw"], jnp.zeros_like(t), rolled)
        if pad_mode == "edge":
            res = res + jnp.where(masks["l0"], t, 0.0)
        return res
    # s == +1: A[l] = dz[l-1]; invalid at l = 0; edge: + dz[W-1] at l = W-1.
    rolled = pltpu.roll(t, 1, 1)
    res = jnp.where(masks["l0"], jnp.zeros_like(t), rolled)
    if pad_mode == "edge":
        res = res + jnp.where(masks["lw"], t, 0.0)
    return res


def _adj_shift_sub(t, s, pad_mode, masks):
    """Adjoint sublane (H) tap shift — same structure as `_adj_shift_lane`."""
    if s == 0:
        return t
    if s == -1:
        rolled = pltpu.roll(t, t.shape[0] - 1, 0)
        res = jnp.where(masks["rh"], jnp.zeros_like(t), rolled)
        if pad_mode == "edge":
            res = res + jnp.where(masks["r0"], t, 0.0)
        return res
    rolled = pltpu.roll(t, 1, 0)
    res = jnp.where(masks["r0"], jnp.zeros_like(t), rolled)
    if pad_mode == "edge":
        res = res + jnp.where(masks["rh"], t, 0.0)
    return res


def _conv3p_adj_kernel(g_hbm, k_ref, o_ref, g_tile, sem_g, *, cin, cout, td,
                       nd, h, w, wl, pad_mode, d_total):
    """Input-gradient of the 3^3 stencil: dx[j] = sum_t k_t dz[j - t] over
    taps t in {-1, 0, 1}^3 with zero-fill adjoint shifts, plus boundary
    accumulation terms for the edge-pad (ReplicationPad3d) case.

    Same tiling/DMA skeleton as the forward `_conv3p_kernel`; the D halo is
    always zero-filled and the D-axis edge corrections are two small
    epilogues on the first/last global plane."""
    bi = pl.program_id(0)
    i = pl.program_id(1)

    def _zero_front():
        for co in range(cout):
            g_tile[co, 0] = jnp.zeros((h, w), jnp.float32)

    def _zero_back():
        for co in range(cout):
            g_tile[co, td + 1] = jnp.zeros((h, w), jnp.float32)

    # g_hbm is (B*C_out, D, H, W) — 4D refs, see `_conv3p_kernel`.
    bc = pl.multiple_of(bi * cout, cout)
    if nd == 1:
        dma = pltpu.make_async_copy(
            g_hbm.at[pl.ds(bc, cout), pl.ds(0, td), :, :],
            g_tile.at[:, 1:td + 1],
            sem_g,
        )
        dma.start()
        dma.wait()
        _zero_front()
        _zero_back()
    else:
        @pl.when(jnp.logical_and(i > 0, i < nd - 1))
        def _():
            dma = pltpu.make_async_copy(
                g_hbm.at[pl.ds(bc, cout), pl.ds(i * td - 1, td + 2), :, :],
                g_tile,
                sem_g,
            )
            dma.start()
            dma.wait()

        @pl.when(i == 0)
        def _():
            dma = pltpu.make_async_copy(
                g_hbm.at[pl.ds(bc, cout), pl.ds(0, td + 1), :, :],
                g_tile.at[:, 1:td + 2], sem_g,
            )
            dma.start()
            dma.wait()
            _zero_front()

        @pl.when(i == nd - 1)
        def _():
            dma = pltpu.make_async_copy(
                g_hbm.at[pl.ds(bc, cout), pl.ds(d_total - td - 1, td + 1), :, :],
                g_tile.at[:, 0:td + 1], sem_g,
            )
            dma.start()
            dma.wait()
            _zero_back()

    masks = _make_masks(h, w, wl, pad_mode)

    def _tap_accumulate(accs, plane, dd):
        """accs[ci] += sum_{hh,ww,co} A(plane[co]) * k[(dd,hh,ww), ci, co]
        for one already-selected dz plane per co (list of (h, w))."""
        for co in range(cout):
            for ww in range(3):
                wv = _adj_shift_lane(plane[co], ww - 1, pad_mode, masks)
                for hh in range(3):
                    hv = _adj_shift_sub(wv, hh - 1, pad_mode, masks)
                    for ci in range(cin):
                        kv = k_ref[((dd * 3 + hh) * 3 + ww) * cin + ci, co]
                        accs[ci] = accs[ci] + hv * kv
        return accs

    def body(dloc, carry):
        accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cin)]
        for dd in range(3):
            # dx[j] needs dz[j - (dd-1)] -> local plane dloc + 2 - dd.
            plane = [
                g_tile[co, pl.ds(dloc + 2 - dd, 1)][0] for co in range(cout)
            ]
            accs = _tap_accumulate(accs, plane, dd)
        for ci in range(cin):
            o_ref[ci, pl.ds(dloc, 1)] = accs[ci][None].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, td, body, 0)

    if pad_mode == "edge":
        # D-axis boundary accumulation: the forward's edge fill reads plane
        # 0 for the dd=0 tap at d=0 (and plane D-1 for dd=2 at d=D-1), so
        # the adjoint adds k[dd=0] (x) A_hw(dz[0]) into dx[0] (resp. back).
        @pl.when(i == 0)
        def _():
            accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cin)]
            plane = [g_tile[co, 1] for co in range(cout)]
            accs = _tap_accumulate(accs, plane, 0)
            for ci in range(cin):
                o_ref[ci, 0] = o_ref[ci, 0] + accs[ci].astype(o_ref.dtype)

        @pl.when(i == nd - 1)
        def _():
            accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cin)]
            plane = [g_tile[co, td] for co in range(cout)]
            accs = _tap_accumulate(accs, plane, 2)
            for ci in range(cin):
                o_ref[ci, td - 1] = (
                    o_ref[ci, td - 1] + accs[ci].astype(o_ref.dtype)
                )


def _pick_td(d, h, w, cin, cout, budget=10 * 1024 * 1024, db=False,
             db_out=False):
    """Largest depth tile fitting input scratch + output block in VMEM.
    (Compile time no longer scales with td — the depth loop is a
    fori_loop, so only the 27*cin*cout body is unrolled.)  ``db`` doubles
    the input-scratch term for the two-slot double-buffered kernel;
    ``db_out`` doubles the second (cout-sized) tile as well (wgrad
    double-buffers its cotangent tile; the forward's residual tile stays
    single-buffered)."""
    for td in (64, 32, 16, 8, 4, 2, 1):
        if d % td:
            continue
        xin = cin * (td + 2) * (2 if db else 1)
        zin = cout * td * (2 if db_out else 1)
        need = (xin + zin) * h * w * 4
        if need <= budget:
            return td
    return 1


def conv3_planes_adjoint(
    dz: jax.Array,
    kernel: jax.Array,
    *,
    pad_mode: str = "zero",
    interpret: bool | None = None,
    td_override: int | None = None,
    db: bool | None = None,
    kdma: bool | None = None,
) -> jax.Array:
    """dL/dx of `conv3_planes` given dz = dL/d(pre-activation output).

    dz (B, C_out, D, H, W), kernel (3, 3, 3, C_in, C_out) — the FORWARD
    kernel (tap flipping happens via the adjoint shifts inside the kernel).
    Returns (B, C_in, D, H, W) float32."""
    if interpret is None:
        interpret = not on_tpu_default_device()
    if db is None:
        db = _db_enabled()
    if kdma is None:
        kdma = _kdma_enabled()
    return _conv3_planes_adjoint_jit(
        dz, kernel, pad_mode=pad_mode, interpret=interpret,
        td_override=td_override, db=db, kdma=kdma,
    )


@functools.partial(
    jax.jit,
    static_argnames=("pad_mode", "interpret", "td_override", "db", "kdma"),
)
def _conv3_planes_adjoint_jit(
    dz, kernel, *, pad_mode, interpret, td_override, db, kdma,
):
    b, cout, d, h, w = dz.shape
    cin = kernel.shape[3]
    assert kernel.shape == (3, 3, 3, cin, cout), kernel.shape
    assert w <= 128 and h % 8 == 0
    assert cin * cout <= 64

    wl = w
    if w < 128:  # lane-pad, see conv3_planes
        dz = jnp.pad(dz, ((0, 0),) * 4 + ((0, 128 - w),))
        w = 128

    td = td_override or _pick_td(d, h, w, cout, cin, db=db)
    nd = d // td
    kf = kernel.reshape(27 * cin, cout).astype(jnp.float32)

    dzf = dz.astype(jnp.float32).reshape(b * cout, d, h, w)
    if db:
        if not kdma:
            # Adjoint D halo is zero for both pad modes (the edge-pad
            # boundary terms are explicit epilogue adds); kdma fills the
            # zero halo in-scratch instead of this host-side copy.
            dzf = jnp.pad(dzf, ((0, 0), (1, 1), (0, 0), (0, 0)))
        kern = functools.partial(
            _conv3p_adj_kernel_db, cin=cin, cout=cout, td=td, nd=nd, h=h,
            w=w, wl=wl, pad_mode=pad_mode, kdma=kdma,
        )
        g_scratch = pltpu.VMEM((cout, 2 * (td + 2), h, w), jnp.float32)
        sems = [pltpu.SemaphoreType.DMA((2,))]
    else:
        kern = functools.partial(
            _conv3p_adj_kernel, cin=cin, cout=cout, td=td, nd=nd, h=h, w=w,
            wl=wl, pad_mode=pad_mode, d_total=d,
        )
        g_scratch = pltpu.VMEM((cout, td + 2, h, w), jnp.float32)
        sems = [pltpu.SemaphoreType.DMA]
    out = pl.pallas_call(
        kern,
        grid=(b, nd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # dz (manual halo DMA)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kernel rows
        ],
        out_specs=pl.BlockSpec(
            (cin, td, h, w), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * cin, d, h, w), jnp.float32),
        scratch_shapes=[g_scratch] + sems,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h * w * 27 * cin * cout,
            bytes_accessed=dz.size * 4 + b * cin * d * h * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dzf, kf)
    out = out.reshape(b, cin, d, h, w)
    return out[..., :wl] if wl != w else out


def _conv3p_adj_kernel_db(g_hbm, k_ref, o_ref, g_tile, sems, *, cin, cout,
                          td, nd, h, w, wl, pad_mode, kdma):
    """Double-buffered `_conv3p_adj_kernel`: the adjoint's D halo is ZERO
    for both pad modes (the edge-pad boundary terms are explicit epilogue
    adds).  With ``kdma`` the unpadded dz is read via first/interior/last
    DMA branches and the zero halo plane is filled in-scratch; otherwise
    dz arrives zero-padded host-side and each grid step issues one
    fixed-shape DMA.  Same two-slot plane-axis prefetch scheme as
    `_conv3p_kernel_db`."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    g = bi * nd + i
    total = pl.num_programs(0) * nd
    tp2 = td + 2

    def issue_dma(gg, slot, op):
        bb = gg // nd
        ii = gg - bb * nd
        bc = pl.ds(pl.multiple_of(bb * cout, cout), cout)
        if not kdma:
            dma = pltpu.make_async_copy(
                g_hbm.at[bc, pl.ds(ii * td, tp2), :, :],
                g_tile.at[:, pl.ds(slot * tp2, tp2)],
                sems.at[slot],
            )
            getattr(dma, op)()
            return
        if nd == 1:
            dma = pltpu.make_async_copy(
                g_hbm.at[bc, pl.ds(0, td), :, :],
                g_tile.at[:, pl.ds(slot * tp2 + 1, td)],
                sems.at[slot],
            )
            getattr(dma, op)()
            return

        @pl.when(ii == 0)
        def _():
            dma = pltpu.make_async_copy(
                g_hbm.at[bc, pl.ds(0, td + 1), :, :],
                g_tile.at[:, pl.ds(slot * tp2 + 1, td + 1)],
                sems.at[slot],
            )
            getattr(dma, op)()

        @pl.when(jnp.logical_and(ii > 0, ii < nd - 1))
        def _():
            dma = pltpu.make_async_copy(
                g_hbm.at[bc, pl.ds(ii * td - 1, tp2), :, :],
                g_tile.at[:, pl.ds(slot * tp2, tp2)],
                sems.at[slot],
            )
            getattr(dma, op)()

        @pl.when(ii == nd - 1)
        def _():
            dma = pltpu.make_async_copy(
                g_hbm.at[bc, pl.ds((nd - 1) * td - 1, td + 1), :, :],
                g_tile.at[:, pl.ds(slot * tp2, td + 1)],
                sems.at[slot],
            )
            getattr(dma, op)()

    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        issue_dma(g, slot, "start")

    @pl.when(g + 1 < total)
    def _():
        issue_dma(g + 1, nslot, "start")

    issue_dma(g, slot, "wait")
    soff = slot * tp2

    if kdma:
        # Adjoint halo is zero for BOTH pad modes.
        _db_fill_halo(g_tile, soff, i, cout, td, nd, h, w, "zero")

    masks = _make_masks(h, w, wl, pad_mode)

    def _tap_accumulate(accs, plane, dd):
        for co in range(cout):
            for ww in range(3):
                wv = _adj_shift_lane(plane[co], ww - 1, pad_mode, masks)
                for hh in range(3):
                    hv = _adj_shift_sub(wv, hh - 1, pad_mode, masks)
                    for ci in range(cin):
                        kv = k_ref[((dd * 3 + hh) * 3 + ww) * cin + ci, co]
                        accs[ci] = accs[ci] + hv * kv
        return accs

    def body(dloc, carry):
        accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cin)]
        for dd in range(3):
            plane = [
                g_tile[co, pl.ds(soff + dloc + 2 - dd, 1)][0]
                for co in range(cout)
            ]
            accs = _tap_accumulate(accs, plane, dd)
        for ci in range(cin):
            o_ref[ci, pl.ds(dloc, 1)] = accs[ci][None].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, td, body, 0)

    if pad_mode == "edge":
        @pl.when(i == 0)
        def _():
            accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cin)]
            plane = [g_tile[co, pl.ds(soff + 1, 1)][0] for co in range(cout)]
            accs = _tap_accumulate(accs, plane, 0)
            for ci in range(cin):
                o_ref[ci, 0] = o_ref[ci, 0] + accs[ci].astype(o_ref.dtype)

        @pl.when(i == nd - 1)
        def _():
            accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cin)]
            plane = [g_tile[co, pl.ds(soff + td, 1)][0] for co in range(cout)]
            accs = _tap_accumulate(accs, plane, 2)
            for ci in range(cin):
                o_ref[ci, td - 1] = (
                    o_ref[ci, td - 1] + accs[ci].astype(o_ref.dtype)
                )


def _conv3p_wgrad_kernel_db(x_hbm, z_hbm, o_ref, x_tile, z_tile, sems_x,
                            sems_z, *, cin, cout, td, nd, h, w, wl, pad_mode,
                            has_bias, kdma):
    """Double-buffered `_conv3p_wgrad_kernel`: both the x and dz tiles of
    the NEXT grid step are prefetched while the current step accumulates.
    With ``kdma`` the x halo rides first/interior/last DMA branches on the
    unpadded tensor (fill in-scratch); otherwise x arrives depth-halo-
    padded host-side."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    g = bi * nd + i
    total = pl.num_programs(0) * nd
    tp2 = td + 2
    ncc = cin * cout

    def issue_xdma(gg, slot, op):
        bb = gg // nd
        ii = gg - bb * nd
        bc = pl.ds(pl.multiple_of(bb * cin, cin), cin)
        if not kdma:
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds(ii * td, tp2), :, :],
                x_tile.at[:, pl.ds(slot * tp2, tp2)],
                sems_x.at[slot],
            )
            getattr(dma, op)()
            return
        if nd == 1:
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds(0, td), :, :],
                x_tile.at[:, pl.ds(slot * tp2 + 1, td)],
                sems_x.at[slot],
            )
            getattr(dma, op)()
            return

        @pl.when(ii == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds(0, td + 1), :, :],
                x_tile.at[:, pl.ds(slot * tp2 + 1, td + 1)],
                sems_x.at[slot],
            )
            getattr(dma, op)()

        @pl.when(jnp.logical_and(ii > 0, ii < nd - 1))
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds(ii * td - 1, tp2), :, :],
                x_tile.at[:, pl.ds(slot * tp2, tp2)],
                sems_x.at[slot],
            )
            getattr(dma, op)()

        @pl.when(ii == nd - 1)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bc, pl.ds((nd - 1) * td - 1, td + 1), :, :],
                x_tile.at[:, pl.ds(slot * tp2, td + 1)],
                sems_x.at[slot],
            )
            getattr(dma, op)()

    def issue_zdma(gg, slot, op):
        bb = gg // nd
        ii = gg - bb * nd
        dma = pltpu.make_async_copy(
            z_hbm.at[pl.ds(pl.multiple_of(bb * cout, cout), cout),
                     pl.ds(ii * td, td), :, :],
            z_tile.at[:, pl.ds(slot * td, td)],
            sems_z.at[slot],
        )
        getattr(dma, op)()

    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        issue_xdma(g, slot, "start")
        issue_zdma(g, slot, "start")
        o_ref[...] = jnp.zeros(o_ref.shape, jnp.float32)

    @pl.when(g + 1 < total)
    def _():
        issue_xdma(g + 1, nslot, "start")
        issue_zdma(g + 1, nslot, "start")

    issue_xdma(g, slot, "wait")
    issue_zdma(g, slot, "wait")
    soff = slot * tp2
    zoff = slot * td

    if kdma:
        _db_fill_halo(x_tile, soff, i, cin, td, nd, h, w, pad_mode)

    masks = _make_masks(h, w, wl, pad_mode)

    def body(dloc, carry):
        zs = [z_tile[co, pl.ds(zoff + dloc, 1)][0] for co in range(cout)]
        for ci in range(cin):
            for dd in range(3):
                plane = x_tile[ci, pl.ds(soff + dloc + dd, 1)][0]
                for ww in range(3):
                    if ww == 1:
                        wv = plane
                    else:
                        wv = _shift_lane(plane, ww - 1, pad_mode, wl, masks)
                    for hh in range(3):
                        if hh == 1:
                            hv = wv
                        else:
                            hv = _shift_sub(wv, hh - 1, pad_mode, h, masks)
                        base = ((dd * 3 + hh) * 3 + ww) * ncc + ci * cout
                        for co in range(cout):
                            o_ref[base + co] = (
                                o_ref[base + co] + hv * zs[co]
                            )
        if has_bias:
            for co in range(cout):
                o_ref[27 * ncc + co] = o_ref[27 * ncc + co] + zs[co]
        return carry

    jax.lax.fori_loop(0, td, body, 0)


def _conv3p_wgrad_kernel(x_hbm, z_hbm, o_ref, x_tile, z_tile, sem_x, sem_z,
                         *, cin, cout, td, nd, h, w, wl, pad_mode, d_total,
                         has_bias):
    """Weight (+bias) gradient of the 3^3 stencil.

    dk[t, ci, co] = sum_j x_pad[j + t - 1, ci] * dz[j, co]: the SAME shifted
    planes the forward kernel multiplies by k[t] are here multiplied by the
    cotangent plane and accumulated.  The output block (27*cin*cout [+cout]
    rows of (h, w) partial sums) has a CONSTANT index map over the whole
    (b, nd) grid, so Mosaic keeps it resident in VMEM and writes it back
    once; the host-side wrapper reduces each row to a scalar.  Batch and
    depth are therefore summed in-kernel for free.
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    ncc = cin * cout

    def _fill_front():
        for ci in range(cin):
            x_tile[ci, 0] = (x_tile[ci, 1] if pad_mode == "edge"
                             else jnp.zeros((h, w), jnp.float32))

    def _fill_back():
        for ci in range(cin):
            x_tile[ci, td + 1] = (x_tile[ci, td] if pad_mode == "edge"
                                  else jnp.zeros((h, w), jnp.float32))

    bc = pl.multiple_of(bi * cin, cin)
    if nd == 1:
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(bc, cin), pl.ds(0, td), :, :],
            x_tile.at[:, 1:td + 1], sem_x,
        )
        dma.start()
        dma.wait()
        _fill_front()
        _fill_back()
    else:
        @pl.when(jnp.logical_and(i > 0, i < nd - 1))
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(bc, cin), pl.ds(i * td - 1, td + 2), :, :],
                x_tile, sem_x,
            )
            dma.start()
            dma.wait()

        @pl.when(i == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(bc, cin), pl.ds(0, td + 1), :, :],
                x_tile.at[:, 1:td + 2], sem_x,
            )
            dma.start()
            dma.wait()
            _fill_front()

        @pl.when(i == nd - 1)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(bc, cin), pl.ds(d_total - td - 1, td + 1), :, :],
                x_tile.at[:, 0:td + 1], sem_x,
            )
            dma.start()
            dma.wait()
            _fill_back()

    zdma = pltpu.make_async_copy(
        z_hbm.at[pl.ds(pl.multiple_of(bi * cout, cout), cout),
                 pl.ds(i * td, td), :, :],
        z_tile, sem_z,
    )
    zdma.start()
    zdma.wait()

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, jnp.float32)

    masks = _make_masks(h, w, wl, pad_mode)

    def body(dloc, carry):
        zs = [z_tile[co, pl.ds(dloc, 1)][0] for co in range(cout)]
        for ci in range(cin):
            for dd in range(3):
                plane = x_tile[ci, pl.ds(dloc + dd, 1)][0]
                for ww in range(3):
                    if ww == 1:
                        wv = plane
                    else:
                        wv = _shift_lane(plane, ww - 1, pad_mode, wl, masks)
                    for hh in range(3):
                        if hh == 1:
                            hv = wv
                        else:
                            hv = _shift_sub(wv, hh - 1, pad_mode, h, masks)
                        base = ((dd * 3 + hh) * 3 + ww) * ncc + ci * cout
                        for co in range(cout):
                            o_ref[base + co] = (
                                o_ref[base + co] + hv * zs[co]
                            )
        if has_bias:
            for co in range(cout):
                o_ref[27 * ncc + co] = o_ref[27 * ncc + co] + zs[co]
        return carry

    jax.lax.fori_loop(0, td, body, 0)


def conv3_planes_wgrad(
    x: jax.Array,
    dz: jax.Array,
    *,
    pad_mode: str = "zero",
    has_bias: bool = True,
    interpret: bool | None = None,
    td_override: int | None = None,
    db: bool | None = None,
    kdma: bool | None = None,
):
    """dL/dkernel (and dL/dbias) of `conv3_planes` on the VPU.

    x (B, C_in, D, H, W), dz (B, C_out, D, H, W) = dL/d(pre-activation).
    Returns (dk (3, 3, 3, C_in, C_out) float32, db (C_out,) float32 or
    None).  XLA's own weight-grad lowering for these shapes is an
    MXU-hostile 27-output huge-K correlation (measured 18-25 ms per conv at
    128^3 vs ~6 ms for the whole Pallas forward); this kernel pays exactly
    the forward's flops plus accumulator traffic instead."""
    if interpret is None:
        interpret = not on_tpu_default_device()
    if db is None:
        db = _db_enabled()
    if kdma is None:
        kdma = _kdma_enabled()
    return _conv3_planes_wgrad_jit(
        x, dz, pad_mode=pad_mode, has_bias=has_bias, interpret=interpret,
        td_override=td_override, db=db, kdma=kdma,
    )


@functools.partial(
    jax.jit,
    static_argnames=("pad_mode", "has_bias", "interpret", "td_override",
                     "db", "kdma"),
)
def _conv3_planes_wgrad_jit(
    x, dz, *, pad_mode, has_bias, interpret, td_override, db, kdma,
):
    b, cin, d, h, w = x.shape
    cout = dz.shape[1]
    assert dz.shape == (b, cout, d, h, w), (dz.shape, x.shape)
    assert w <= 128 and h % 8 == 0
    assert cin * cout <= 32, "accumulator rows would blow VMEM/compile"

    wl = w
    if w < 128:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, 128 - w),))
        dz = jnp.pad(dz, ((0, 0),) * 4 + ((0, 128 - w),))
        w = 128

    rows = 27 * cin * cout + (cout if has_bias else 0)
    # VMEM budget: resident accumulator + input/cotangent tiles.
    acc_bytes = rows * h * w * 4
    td = td_override or _pick_td(
        d, h, w, cin, cout,
        budget=max(80 * 1024 * 1024 - acc_bytes, h * w * 8), db=db,
        db_out=db,
    )
    nd = d // td

    xf = x.astype(jnp.float32).reshape(b * cin, d, h, w)
    zf = dz.astype(jnp.float32).reshape(b * cout, d, h, w)
    if db:
        if not kdma:
            mode = "edge" if pad_mode == "edge" else "constant"
            xf = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)), mode=mode)
        kern = functools.partial(
            _conv3p_wgrad_kernel_db, cin=cin, cout=cout, td=td, nd=nd, h=h,
            w=w, wl=wl, pad_mode=pad_mode, has_bias=has_bias, kdma=kdma,
        )
        scratches = [
            pltpu.VMEM((cin, 2 * (td + 2), h, w), jnp.float32),
            pltpu.VMEM((cout, 2 * td, h, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = functools.partial(
            _conv3p_wgrad_kernel, cin=cin, cout=cout, td=td, nd=nd, h=h,
            w=w, wl=wl, pad_mode=pad_mode, d_total=d, has_bias=has_bias,
        )
        scratches = [
            pltpu.VMEM((cin, td + 2, h, w), jnp.float32),
            pltpu.VMEM((cout, td, h, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    out = pl.pallas_call(
        kern,
        grid=(b, nd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x (manual halo DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # dz (manual DMA)
        ],
        out_specs=pl.BlockSpec(
            (rows, h, w), lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((rows, h, w), jnp.float32),
        scratch_shapes=scratches,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h * w * 27 * cin * cout,
            bytes_accessed=x.size * 4 + dz.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, zf)
    sums = out.sum(axis=(1, 2))  # (rows,)
    dk = sums[:27 * cin * cout].reshape(3, 3, 3, cin, cout)
    db = sums[27 * cin * cout:] if has_bias else None
    return dk, db


def _weight_grad_xla(x, dz, pad_mode):
    """dL/dkernel via XLA's conv transpose rule: the weight gradient of a
    3^3 conv is 27 huge-K correlations — MXU-shaped (K = B*D*H*W), so XLA
    is the right engine for it (the Pallas VPU stencil would pay the same
    flops without the systolic array)."""
    cin = x.shape[1]
    cout = dz.shape[1]
    mode = "edge" if pad_mode == "edge" else "constant"
    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)),
        mode=mode,
    )

    def conv_only(k):
        return jax.lax.conv_general_dilated(
            xp, k, (1, 1, 1), "VALID",
            dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
            preferred_element_type=jnp.float32,
        )

    _, vjp = jax.vjp(conv_only, jnp.zeros((3, 3, 3, cin, cout), jnp.float32))
    return vjp(dz.astype(jnp.float32))[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _conv3p_diff(act, pad_mode, interpret, td_override, x, kernel, bias,
                 residual):
    return conv3_planes(
        x, kernel, bias, residual, act=act, pad_mode=pad_mode,
        interpret=interpret,
    )


def _conv3p_diff_fwd(act, pad_mode, interpret, td_override, x, kernel, bias,
                     residual):
    out = conv3_planes(
        x, kernel, bias, residual, act=act, pad_mode=pad_mode,
        interpret=interpret,
    )
    saved_out = out if act != "none" else None
    return out, (x, kernel, bias, residual, saved_out)


def _conv3p_diff_bwd(act, pad_mode, interpret, td_override, res, g):
    x, kernel, bias, residual, out = res
    g = g.astype(jnp.float32)
    if act == "relu":
        # out > 0 <=> pre-activation > 0 (and d/dz relu(0) := 0).
        dz = g * (out > 0).astype(jnp.float32)
    elif act == "leaky":
        dz = g * jnp.where(out >= 0, 1.0, 0.2).astype(jnp.float32)
    else:
        dz = g
    dx = conv3_planes_adjoint(
        dz, kernel, pad_mode=pad_mode, interpret=interpret,
        td_override=td_override,
    ).astype(x.dtype)
    cin, cout = x.shape[1], dz.shape[1]
    if cin * cout <= 32:
        dk, db = conv3_planes_wgrad(
            x, dz, pad_mode=pad_mode, has_bias=bias is not None,
            interpret=interpret,
        )
    else:
        # The wgrad kernel's resident (27*cin*cout, H, W) accumulator and
        # its unrolled FMA count cap it at cin*cout <= 32; the forward /
        # adjoint kernels go to 64 (admitting the UNet's 8->8 and 12->4
        # convs).  In the 32 < cin*cout <= 64 band keep the kernelled
        # fwd/dx and take XLA's correlation for dk (~3.4 ms at the 64^3
        # 8->8 shape — tolerable, unlike its 1x-channel cousins).
        dk = _weight_grad_xla(x, dz, pad_mode)
        db = dz.sum(axis=(0, 2, 3, 4)) if bias is not None else None
    dk = dk.astype(kernel.dtype)
    db = db.astype(bias.dtype) if bias is not None else None
    dres = dz.astype(residual.dtype) if residual is not None else None
    return dx, dk, db, dres


_conv3p_diff.defvjp(_conv3p_diff_fwd, _conv3p_diff_bwd)


def conv3_planes_diff(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    *,
    act: str = "none",
    pad_mode: str = "zero",
    interpret: bool | None = None,
    td_override: int | None = None,
) -> jax.Array:
    """Differentiable `conv3_planes`: the Pallas stencil forward with a
    custom VJP (Pallas adjoint stencil for dx, XLA conv transpose for dk)
    so training keeps the kernelled path (round-2 VERDICT #1).  No
    pre-affine support — callers that fuse a preceding normalisation
    affine must use the inference-only `conv3_planes` directly."""
    return _conv3p_diff(
        act, pad_mode, interpret, td_override, x, kernel, bias, residual
    )


def conv3_planes(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    pre_scale: jax.Array | None = None,
    pre_shift: jax.Array | None = None,
    *,
    act: str = "none",
    pad_mode: str = "zero",
    pre_relu: bool | None = None,
    interpret: bool | None = None,
    db: bool | None = None,
    kdma: bool | None = None,
    td_override: int | None = None,
) -> jax.Array:
    """SAME 3^3 stride-1 conv on (B, C_in, D, H, W) volumes.

    out = act(conv(pre(x), kernel) + bias [+ residual]) where
    pre(x) = [relu](x * pre_scale + pre_shift) per input channel when given
    (``pre_relu`` controls the ReLU; None = no pre-affine at all).
    kernel (3, 3, 3, C_in, C_out); bias (C_out,); residual
    (B, C_out, D, H, W).  ``pad_mode``: 'zero' (torch SAME) or 'edge'
    (the reference's ReplicationPad3d, `models/ops.py:12,20`).
    Returns (B, C_out, D, H, W) in x.dtype; accumulation in float32
    (numerically TIGHTER than XLA's default-precision conv, which runs
    bf16 MXU passes).
    """
    # Env-dependent statics resolve OUTSIDE the jit so the cache keys on
    # the resolved values (an in-trace read would pin the first call's
    # HP_CONV3P_DB for every later caller).
    if interpret is None:
        interpret = not on_tpu_default_device()
    if db is None:
        db = _db_enabled()
    if kdma is None:
        kdma = _kdma_enabled()
    return _conv3_planes_jit(
        x, kernel, bias, residual, pre_scale, pre_shift, act=act,
        pad_mode=pad_mode, pre_relu=pre_relu, interpret=interpret, db=db,
        kdma=kdma, td_override=td_override,
    )


@functools.partial(
    jax.jit,
    static_argnames=("act", "pad_mode", "pre_relu", "interpret", "db",
                     "kdma", "td_override"),
)
def _conv3_planes_jit(
    x, kernel, bias, residual, pre_scale, pre_shift, *, act, pad_mode,
    pre_relu, interpret, db, kdma, td_override,
):
    b, cin, d, h, w = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:4] == (3, 3, 3, cin), kernel.shape
    assert w <= 128, "W must fit one 128-lane tile"
    assert h % 8 == 0, "H must be sublane-aligned"
    assert cin * cout <= 64, "unrolled FMA count would explode compile time"

    # Sub-128-lane volumes: zero-pad W to a full lane tile (Mosaic requires
    # HBM slice lane extents aligned to the 128 tiling) and mask at the
    # logical boundary in-kernel; the pad lanes stay zero end-to-end and
    # are sliced off below.
    wl = w
    if w < 128:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, 128 - w),))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0),) * 4 + ((0, 128 - w),))
        w = 128

    # db doubles the input scratch; give it a matching budget so the depth
    # tile does NOT shrink (a halved td was measured to cost more than the
    # prefetch won: smaller DMAs + twice the per-step scalar work).
    td = td_override or _pick_td(d, h, w, cin, cout,
                                 budget=(20 if db else 10) * 1024 * 1024,
                                 db=db)
    nd = d // td

    # kernel rows 0..27*cin-1, bias in row 27*cin
    kf = kernel.reshape(27 * cin, cout).astype(jnp.float32)
    bv = (jnp.zeros((cout,), jnp.float32) if bias is None
          else bias.astype(jnp.float32)).reshape(1, cout)
    kf = jnp.concatenate([kf, bv], axis=0)

    if pre_relu is not None:
        assert pre_scale is not None and pre_shift is not None
        aff = jnp.stack([
            pre_scale.astype(jnp.float32), pre_shift.astype(jnp.float32)
        ])  # (2, cin)
    else:
        aff = jnp.zeros((2, cin), jnp.float32)

    has_residual = residual is not None
    if not has_residual:
        residual = jnp.zeros((b * cout, td, 8, 128), jnp.float32)
    else:
        residual = residual.astype(jnp.float32).reshape(b * cout, d, h, w)
    r_tile_shape = (cout, td, h, w) if has_residual else (cout, td, 8, 128)

    xf = x.astype(jnp.float32).reshape(b * cin, d, h, w)
    if db:
        if not kdma:
            # Depth halo applied host-side (a full write+read of the
            # activation per call — the round-4 UNet-grad profile's halo
            # slice pairs) so the kernel's DMA is branch-free; kdma mode
            # (default) absorbs the halo into the kernel's DMA branches
            # instead (round-5 VERDICT #2).
            mode = "edge" if pad_mode == "edge" else "constant"
            xf = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)), mode=mode)
        kern = functools.partial(
            _conv3p_kernel_db, cin=cin, cout=cout, td=td, nd=nd, h=h, w=w,
            wl=wl, act=act, pad_mode=pad_mode, has_residual=has_residual,
            pre_relu=pre_relu, kdma=kdma,
        )
        x_scratch = pltpu.VMEM((cin, 2 * (td + 2), h, w), jnp.float32)
        sems = [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA]
    else:
        kern = functools.partial(
            _conv3p_kernel, cin=cin, cout=cout, td=td, nd=nd, h=h, w=w,
            wl=wl, act=act, pad_mode=pad_mode, has_residual=has_residual,
            pre_relu=pre_relu, d_total=d,
        )
        x_scratch = pltpu.VMEM((cin, td + 2, h, w), jnp.float32)
        sems = [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    out = pl.pallas_call(
        kern,
        grid=(b, nd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # input (manual DMA)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kernel+bias rows
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pre-affine (2, cin)
            pl.BlockSpec(memory_space=pl.ANY),      # residual (manual DMA)
        ],
        out_specs=pl.BlockSpec(
            (cout, td, h, w), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * cout, d, h, w), x.dtype),
        scratch_shapes=[
            x_scratch,
            pltpu.VMEM(r_tile_shape, jnp.float32),
        ] + sems,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h * w * 27 * cin * cout,
            bytes_accessed=x.size * 4 + b * cout * d * h * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, kf, aff, residual)
    out = out.reshape(b, cout, d, h, w)
    return out[..., :wl] if wl != w else out


def conv3_planes_xla(x, kernel, bias=None, residual=None, pre_scale=None,
                     pre_shift=None, *, act="none", pad_mode="zero",
                     pre_relu=None):
    """Reference semantics in plain XLA (used for tests and training)."""
    x = x.astype(jnp.float32)
    if pre_relu is not None:
        x = x * pre_scale[None, :, None, None, None] \
            + pre_shift[None, :, None, None, None]
        if pre_relu:
            x = jnp.maximum(x, 0.0)
    mode = "edge" if pad_mode == "edge" else "constant"
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)), mode=mode)
    out = jax.lax.conv_general_dilated(
        xp, kernel.astype(jnp.float32), (1, 1, 1), "VALID",
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None, None, None]
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    if act == "relu":
        out = jnp.maximum(out, 0.0)
    elif act == "leaky":
        out = jnp.where(out >= 0.0, out, 0.2 * out)
    return out
