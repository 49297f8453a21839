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

Inference-only: training paths keep the XLA conv for autodiff; modules gate
on `train` exactly like `StemS2D(use_pallas=...)`.
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


def _make_masks(h, w, pad_mode):
    """Boundary masks, built ONCE per kernel invocation (a fresh iota per
    shift measurably slows Mosaic's generated code)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    return {
        "l0": lane == 0, "lw": lane == w - 1,
        "r0": row == 0, "rh": row == h - 1,
    }


def _shift_lane(t, step, pad_mode, w, masks):
    """Tap offset `step` ∈ {-1, +1} along lanes: value at lane l becomes
    input at lane l+step, SAME boundary semantics."""
    if step == -1:
        rolled = pltpu.roll(t, 1, 1)
        fill = (jnp.broadcast_to(t[:, 0:1], t.shape) if pad_mode == "edge"
                else jnp.zeros_like(t))
        return jnp.where(masks["l0"], fill, rolled)
    rolled = pltpu.roll(t, t.shape[1] - 1, 1)
    fill = (jnp.broadcast_to(t[:, w - 1:w], t.shape) if pad_mode == "edge"
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
                   sem_x, sem_r, *, cin, cout, td, nd, h, w, act, pad_mode,
                   has_residual, pre_relu, d_total):
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

    if nd == 1:
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, :, pl.ds(0, td), :, :], x_tile.at[:, 1:td + 1],
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
                x_hbm.at[bi, :, pl.ds(i * td - 1, td + 2), :, :], x_tile,
                sem_x,
            )
            dma.start()
            dma.wait()

        @pl.when(i == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, :, pl.ds(0, td + 1), :, :],
                x_tile.at[:, 1:td + 2], sem_x,
            )
            dma.start()
            dma.wait()
            _fill_front()

        @pl.when(i == nd - 1)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, :, pl.ds(d_total - td - 1, td + 1), :, :],
                x_tile.at[:, 0:td + 1], sem_x,
            )
            dma.start()
            dma.wait()
            _fill_back()

    if has_residual:
        rdma = pltpu.make_async_copy(
            r_hbm.at[bi, :, pl.ds(i * td, td), :, :], r_tile, sem_r
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
    masks = _make_masks(h, w, pad_mode)

    def body(dloc, carry):
        accs = [jnp.zeros((h, w), jnp.float32) for _ in range(cout)]
        for ci in range(cin):
            for dd in range(3):
                plane = x_tile[ci, pl.ds(dloc + dd, 1)][0]
                for ww in range(3):
                    if ww == 1:
                        wv = plane
                    else:
                        wv = _shift_lane(plane, ww - 1, pad_mode, w, masks)
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
            o_ref[0, co, pl.ds(dloc, 1)] = out[None].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, td, body, 0)


def _pick_td(d, h, w, cin, cout, budget=10 * 1024 * 1024):
    """Largest depth tile fitting input scratch + output block in VMEM.
    (Compile time no longer scales with td — the depth loop is a
    fori_loop, so only the 27*cin*cout body is unrolled.)"""
    for td in (64, 32, 16, 8, 4, 2, 1):
        if d % td:
            continue
        need = (cin * (td + 2) + cout * td) * h * w * 4
        if need <= budget:
            return td
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("act", "pad_mode", "pre_relu", "interpret"),
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
    b, cin, d, h, w = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:4] == (3, 3, 3, cin), kernel.shape
    assert w <= 128, "W must fit one 128-lane tile"
    assert h % 8 == 0, "H must be sublane-aligned"
    assert cin * cout <= 64, "unrolled FMA count would explode compile time"

    td = _pick_td(d, h, w, cin, cout)
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
        residual = jnp.zeros((b, cout, td, 8, 128), jnp.float32)
    else:
        residual = residual.astype(jnp.float32)
    r_tile_shape = (cout, td, h, w) if has_residual else (cout, td, 8, 128)

    if interpret is None:
        interpret = not on_tpu_default_device()

    kern = functools.partial(
        _conv3p_kernel, cin=cin, cout=cout, td=td, nd=nd, h=h, w=w, act=act,
        pad_mode=pad_mode, has_residual=has_residual, pre_relu=pre_relu,
        d_total=d,
    )
    return pl.pallas_call(
        kern,
        grid=(b, nd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # input (manual DMA)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kernel+bias rows
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pre-affine (2, cin)
            pl.BlockSpec(memory_space=pl.ANY),      # residual (manual DMA)
        ],
        out_specs=pl.BlockSpec(
            (1, cout, td, h, w), lambda bi, i: (bi, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, d, h, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((cin, td + 2, h, w), jnp.float32),
            pltpu.VMEM(r_tile_shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h * w * 27 * cin * cout,
            bytes_accessed=x.size * 4 + b * cout * d * h * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.float32), kf, aff, residual)


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
