"""Pallas TPU kernel: MXU 3x3x3 stride-1 convolution for mid-channel shapes.

Targets the ResNet Bottleneck conv2 shapes of the pose backbone
(`/root/reference/models/posenet3d_50.py:26-120`): c64 @64^3, c128 @32^3,
c256 @16^3 (b2).  XLA's TPU 3D-conv emitter tops out at ~10-15 TF/s at these
shapes in any layout/precision we measured (BENCH_NOTES round-3 profile;
re-measured round 4: L1 fwd 8.5 ms = 13.7 TF/s) — and this chip's HBM
bandwidth is low enough (~175-200 GB/s measured for both XLA pads and manual
DMA) that any formulation materialising a padded/im2col copy of the
activation is dead on arrival (a single host-side halo pad measured 3.4 ms
at the L1 shape — half the kernel budget).

Formulation ("tap-pack", v3):

* Host prep is RESHAPE-ONLY (no pad, no relayout): channels-last x is viewed
  as (B, D, H*Wr, K) where K is the 128-lane unit — the real C_in when
  C_in >= 128, or the (w-pair, C_in) lane fold (Wr = W/2, K = 2*C_in = 128)
  for C_in = 64, which both satisfies Mosaic's 128-lane DMA minimum (a
  64-lane manual DMA crashes the remote compiler, probed round 4) and feeds
  the MXU a full contraction.
* The kernel DMAs whole (H*Wr, K) planes into a flat-row tile with an
  8-row zero head and w-halo row blocks (zeroed every step, no host pad);
  depth halos are conv3p-style first/interior/last DMA branches.
* Per (output plane, kd) ONE matmul P = A @ B_kd with N = 9 slabs packed
  along the columns: slab (kh, g) holds the taps that displace the flat row
  index by kh*Wr + (g-1).  The conv falls out as 9 shifted-slice adds of P
  per (plane, kd), with 2 precomputed boundary masks killing the w-wrap
  garbage (rows that crossed an h boundary).  For the folded layout each
  slab is a (128, 128) block mixing the w-parity phases; taps that fall
  outside a phase's window are zero columns.

Every input element is read from VMEM 3x (once per kd); the MXU does the
im2col implicitly; nothing is ever materialised in HBM beyond x and y.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hiddenpose_tpu.ops.pallas.conv3p import on_tpu_default_device


def _round8(v: int) -> int:
    return -(-v // 8) * 8


_KB_BUDGET = 12 * 1024 * 1024  # packed-weight VMEM budget per pallas_call


def _cout_split(cin: int, cout: int, sw: int, isz: int) -> int:
    """Smallest C_out split factor whose per-call packed weight fits the
    VMEM budget (round-5 VERDICT #8: c512's 28 MB f32 operand busts the
    budget whole, but 2-4 column slices of it fit — the activation tile at
    the 8^3 layer-4 extent is tiny, so re-streaming x per slice is cheap).
    Returns 0 if no valid split exists.  Folded (cin=64) shapes never need
    splitting (1.7 MB operand) and keep split=1 by construction."""
    kbytes = 3 * max(cin, 128) * 9 * sw * isz
    ns = 1
    while kbytes // ns > _KB_BUDGET:
        ns *= 2
        if cout % (64 * ns) or (cin == 64):
            return 0
    return ns


def _shape_ok(shape, cin: int, cout: int) -> bool:
    """Mechanical shape eligibility (no env gates, no VMEM math): the
    layouts the kernel can execute at all."""
    b, d, h, w, _ = shape
    if cout % 64 or cout < 64:
        return False
    if cin == 64:
        wr = w // 2
        if w % 2 or wr % 8 or wr < 8:
            return False
    elif cin % 128 == 0:
        if w % 8:
            return False
    else:
        return False
    return h >= 3 and d >= 1


def conv3mxu_supported(shape, cin: int, cout: int) -> bool:
    """ROUTER-level eligibility: shapes the kernel handles AND is allowed
    to take on the production path.  C_in = 64 (lane-folded) or a multiple
    of 128; C_out a multiple of 64; the packed weight operand (3, K, 9*sw)
    must fit VMEM alongside the tiles — whole, or after the C_out column
    split that makes the c512 layer-4 shapes eligible (round 5; previously
    excluded at 28 MB).  The split check uses the conservative f32 item
    size so routing decisions don't flip with HP_CONV3MXU_DT; the executor
    (`conv3_mxu`) re-derives the split from the actual compute dtype."""
    if not _shape_ok(shape, cin, cout):
        return False
    allow = os.environ.get("HP_CONV3MXU_CIN", "")
    if allow and str(cin) not in allow.split(","):
        return False
    sw = 2 * cout if cin == 64 else cout
    ns = _cout_split(cin, cout, sw, 4)
    if ns > 1 and os.environ.get("HP_CONV3MXU_C512", "0") != "1":
        # Split shapes (layer-4 c512) stay off the production routing until
        # the on-chip composed A/B lands (round-5 measurement discipline:
        # interpret-mode exactness is tested, but the Mosaic lowering runs
        # on hardware before the default train path routes through it).
        return False
    return ns > 0


def _build_bmat(k: jax.Array, folded: bool):
    """Pack the kernel into the tap-slab matmul operand.

    Unfolded: B[kd][ci, (kh*3+kw)*cout + co] = k[kd, kh, kw, ci, co]
    (slab (kh, g=kw) has row-shift kh*Wr + kw - 1).

    Folded (cin=64, lanes = (w_lsb, ci), slab cols = (p, co)): slab (kh, g)
    contributes to output w-phase p at w-pair shift g-1; the tap hit is
    x[2(v+g-1) + lsb] == x[2v+p + (kw-1)]  =>  kw = 2(g-1) + lsb - p + 1,
    kept when 0 <= kw <= 2."""
    if not folded:
        cin, cout = k.shape[3], k.shape[4]
        bm = k.astype(jnp.float32).reshape(3, 9, cin, cout)
        return jnp.transpose(bm, (0, 2, 1, 3)).reshape(3, cin, 9 * cout)
    cout = k.shape[4]
    blocks = []
    for kh in range(3):
        for g in range(3):
            cols = []
            for p in range(2):
                rows = []
                for lsb in range(2):
                    kw = 2 * (g - 1) + lsb - p + 1
                    if 0 <= kw <= 2:
                        rows.append(k[:, kh, kw].astype(jnp.float32))
                    else:
                        rows.append(
                            jnp.zeros((3, 64, cout), jnp.float32)
                        )
                cols.append(jnp.concatenate(rows, axis=1))  # (3, 128, cout)
            blocks.append(jnp.concatenate(cols, axis=2))  # (3, 128, 2*cout)
    return jnp.concatenate(blocks, axis=2)  # (3, 128, 9*2*cout)


def _conv3mxu_kernel(x_hbm, b_ref, sb_ref, o_ref, x_tile, sems, *, dt, nd, h,
                     wr, rows_out, sw, lanes_out, split_kh, fuse_affine,
                     fuse_relu):
    """Two-slot double-buffered: the NEXT grid step's planes DMA while the
    current step computes.  Slots fold into the plane axis of one 3D
    scratch ((2*(dt+2), rows, K), conv3p's layout trick) so all slot
    addressing is a plain dynamic ``pl.ds``; scratch and DMA semaphores
    persist across sequential grid steps on TPU."""
    bi = pl.program_id(0)
    di = pl.program_id(1)
    g = bi * nd + di
    total = pl.num_programs(0) * nd
    tp2 = dt + 2

    rows_tile = x_tile.shape[1]
    kdim = x_tile.shape[2]
    cd = x_tile.dtype
    zplane = jnp.zeros((1, rows_tile, kdim), cd)

    def start_dma(gg, sl):
        """Issue the depth-halo DMA (first/interior/last branches) for
        flattened grid step ``gg`` into slot ``sl``, zeroing the halo
        plane(s) the DMA does not write.  All stores target regions the
        in-flight copy never touches."""
        bb = gg // nd
        ii = gg - bb * nd
        soff = sl * tp2

        def _dst(p0, np_):
            return x_tile.at[pl.ds(soff + p0, np_), pl.ds(8 + wr, rows_out)]

        if nd == 1:
            pltpu.make_async_copy(
                x_hbm.at[bb], _dst(1, dt), sems.at[sl]
            ).start()
            x_tile[pl.ds(soff, 1)] = zplane
            x_tile[pl.ds(soff + dt + 1, 1)] = zplane
        else:
            @pl.when(ii == 0)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(0, dt + 1)], _dst(1, dt + 1),
                    sems.at[sl],
                ).start()
                x_tile[pl.ds(soff, 1)] = zplane

            @pl.when(jnp.logical_and(ii > 0, ii < nd - 1))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(ii * dt - 1, dt + 2)], _dst(0, dt + 2),
                    sems.at[sl],
                ).start()

            @pl.when(ii == nd - 1)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(ii * dt - 1, dt + 1)], _dst(0, dt + 1),
                    sems.at[sl],
                ).start()
                x_tile[pl.ds(soff + dt + 1, 1)] = zplane

    def wait_dma(gg, sl):
        bb = gg // nd
        ii = gg - bb * nd
        soff = sl * tp2

        def _dst(p0, np_):
            return x_tile.at[pl.ds(soff + p0, np_), pl.ds(8 + wr, rows_out)]

        if nd == 1:
            pltpu.make_async_copy(
                x_hbm.at[bb], _dst(1, dt), sems.at[sl]
            ).wait()
        else:
            @pl.when(ii == 0)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(0, dt + 1)], _dst(1, dt + 1),
                    sems.at[sl],
                ).wait()

            @pl.when(jnp.logical_and(ii > 0, ii < nd - 1))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(ii * dt - 1, dt + 2)], _dst(0, dt + 2),
                    sems.at[sl],
                ).wait()

            @pl.when(ii == nd - 1)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(ii * dt - 1, dt + 1)], _dst(0, dt + 1),
                    sems.at[sl],
                ).wait()

    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    # The head/tail halo row blocks (w-shift scratch area around the real
    # rows) are DISJOINT from every DMA destination, so they only need
    # zeroing once per slot — the first two grid steps cover both slots.
    @pl.when(g < 2)
    def _():
        soff = slot * tp2
        zhead = jnp.zeros((8 + wr, kdim), cd)
        ztail = jnp.zeros((rows_tile - (8 + (h + 1) * wr), kdim), cd)
        for p in range(tp2):
            x_tile[pl.ds(soff + p, 1), 0:8 + wr] = zhead[None]
            x_tile[pl.ds(soff + p, 1), 8 + (h + 1) * wr:] = ztail[None]

    @pl.when(g == 0)
    def _():
        start_dma(g, slot)

    @pl.when(g + 1 < total)
    def _():
        start_dma(g + 1, nslot)

    wait_dma(g, slot)
    soff = slot * tp2

    # Boundary masks: slab g=0 read row v-1 (garbage where v==0 wrapped
    # from the previous h row); g=2 read v+1 (garbage where v==wr-1).
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows_out, sw), 0)
    m0 = (ridx % wr) == 0
    mw = (ridx % wr) == wr - 1

    for dd in range(dt):
        acc = None
        for kd in range(3):
            a = x_tile[pl.ds(soff + dd + kd, 1)][0]  # (rows_tile, K)
            for ks in range(3 if split_kh else 1):
                # NB: without an explicit precision, an f32 jnp.dot still
                # runs ONE bf16 MXU pass (default precision) — HIGHEST is
                # what makes cdt=f32 actually compute in f32 (3-pass).
                prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                        else jax.lax.Precision.DEFAULT)
                if split_kh:
                    p = jnp.dot(a, b_ref[kd, :, ks * 3 * sw:(ks + 1) * 3 * sw],
                                preferred_element_type=jnp.float32,
                                precision=prec)
                else:
                    p = jnp.dot(a, b_ref[kd],
                                preferred_element_type=jnp.float32,
                                precision=prec)
                khs = (ks,) if split_kh else (0, 1, 2)
                # NB: `gw` (the kw tap index), not `g` — the outer flattened
                # grid-step variable `g` is still live in this scope.
                for i, kh in enumerate(khs):
                    for gw in range(3):
                        off = 8 + kh * wr + gw - 1
                        sl = p[off:off + rows_out,
                               (i * 3 + gw) * sw:(i * 3 + gw + 1) * sw]
                        if gw == 0:
                            sl = jnp.where(m0, 0.0, sl)
                        elif gw == 2:
                            sl = jnp.where(mw, 0.0, sl)
                        acc = sl if acc is None else acc + sl
        # Fused BN-affine + ReLU epilogue: without it every kernel-routed
        # Bottleneck conv2 pays an extra read+write of its (large) output
        # for the unfused scale/bias/relu pass — measured in-situ as the
        # difference between the kernel LOSING 18 ms and winning.
        if fuse_affine:
            acc = acc * sb_ref[0, :] + sb_ref[1, :]
        if fuse_relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[0, dd] = acc.astype(o_ref.dtype)


def conv3_mxu(x: jax.Array, k: jax.Array,
              scale: jax.Array | None = None,
              shift: jax.Array | None = None,
              relu: bool = False,
              interpret: bool | None = None,
              compute_dtype: str | None = None) -> jax.Array:
    """3^3 stride-1 SAME (torch p=1) conv, NDHWC x (3,3,3,C_in,C_out).

    Optional fused epilogue: ``y*scale + shift`` (per-C_out, the inference
    BatchNorm affine) then ReLU, applied in-register before the VMEM→HBM
    store — the conv's consumer ops would otherwise re-stream the output.

    Compute precision defaults to bf16 with f32 accumulation — the SAME
    arithmetic XLA's own TPU conv emitter uses for f32 operands under
    JAX's default precision (the base path this kernel replaces convolves
    bf16-converted operands; verified in the compiled HLO, tpu_jobs/110).
    bf16 halves the DMA traffic and runs one MXU pass per tap-slab matmul
    instead of the multi-pass f32 decomposition. Override per-call with
    ``compute_dtype='f32'`` or process-wide with HP_CONV3MXU_DT=f32
    (resolved at call time, passed to jit as a static arg).

    Shapes whose packed weight exceeds the per-call VMEM budget (layer-4
    c512: 14 MB bf16 / 28 MB f32) are split along C_out into the smallest
    number of column slices that fit, one pallas_call each, concatenated
    on the channel axis — numerics are identical (each output channel's
    arithmetic is untouched by the split)."""
    if compute_dtype is None:
        compute_dtype = resolve_compute_dtype()
    cin, cout = k.shape[3], k.shape[4]
    isz = 4 if compute_dtype in ("f32", "float32") else 2
    sw = 2 * cout if cin == 64 else cout
    ns = _cout_split(cin, cout, sw, isz)
    assert ns >= 1, (x.shape, cin, cout)
    if ns > 1:
        cw = cout // ns
        parts = []
        for i in range(ns):
            sl = slice(i * cw, (i + 1) * cw)
            parts.append(_conv3_mxu_jit(
                x, k[..., sl],
                None if scale is None else scale[sl],
                None if shift is None else shift[sl],
                relu=relu, interpret=interpret, cdt=compute_dtype,
            ))
        return jnp.concatenate(parts, axis=-1)
    return _conv3_mxu_jit(x, k, scale, shift, relu=relu,
                          interpret=interpret, cdt=compute_dtype)


@functools.partial(jax.jit, static_argnames=("relu", "interpret", "cdt"))
def _conv3_mxu_jit(x: jax.Array, k: jax.Array,
                   scale: jax.Array | None = None,
                   shift: jax.Array | None = None,
                   relu: bool = False,
                   interpret: bool | None = None,
                   cdt: str = "bf16") -> jax.Array:
    b, d, h, w, cin = x.shape
    cout = k.shape[-1]
    assert k.shape[:3] == (3, 3, 3) and k.shape[3] == cin
    # Mechanical check only: slices arrive here from conv3_mxu's C_out
    # split already under the VMEM budget for the ACTUAL compute dtype;
    # re-applying the router gate (f32 item size + HP_CONV3MXU_C512 env)
    # wrongly rejected bf16 c512 halves (tpu_jobs/129f).
    _isz = 4 if cdt in ("f32", "float32") else 2
    _sw = 2 * cout if cin == 64 else cout
    assert _shape_ok(x.shape, cin, cout) and _cout_split(
        cin, cout, _sw, _isz) == 1, (x.shape, cin, cout, cdt)
    cd = jnp.float32 if cdt in ("f32", "float32") else jnp.bfloat16
    isz = jnp.dtype(cd).itemsize

    folded = cin == 64
    wr = w // 2 if folded else w
    kdim = 128 if folded else cin
    sw = 2 * cout if folded else cout
    lanes_out = 2 * cout if folded else cout
    rows_out = h * wr
    rows_tile = 16 + (h + 2) * wr

    xr = x.astype(cd).reshape(b, d, rows_out, kdim)
    bmat = _build_bmat(k, folded).astype(cd)  # (3, kdim, 9*sw)

    fuse_affine = scale is not None
    if fuse_affine:
        s = scale.astype(jnp.float32)
        t = shift.astype(jnp.float32)
        if folded:
            # Folded output lanes are (w-phase, C_out) p-major.
            s = jnp.concatenate([s, s])
            t = jnp.concatenate([t, t])
        sb = jnp.stack([s, t])
    else:
        sb = jnp.zeros((2, lanes_out), jnp.float32)

    # Tile depth: VMEM budget for x_tile (dt+2 planes) and the out block.
    env = os.environ.get("HP_CONV3MXU_TILE", "")
    if env:
        dt = int(env)
    else:
        dt = 1
        for c in (16, 8, 4, 2):
            if d % c:
                continue
            if 2 * (c + 2) * rows_tile * kdim * isz > 10 * 1024 * 1024:
                continue
            if c * rows_out * lanes_out * 4 > 3 * 1024 * 1024:
                continue
            dt = c
            break
    nd = d // dt
    # One P buffer ((rows_tile, 9*sw) f32) per matmul: split the kh groups
    # into 3 matmuls when the full-width P would blow the budget.
    split_kh = rows_tile * 9 * sw * 4 > 6 * 1024 * 1024

    if interpret is None:
        interpret = not on_tpu_default_device()

    kernel = functools.partial(
        _conv3mxu_kernel, dt=dt, nd=nd, h=h, wr=wr, rows_out=rows_out,
        sw=sw, lanes_out=lanes_out, split_kh=split_kh,
        fuse_affine=fuse_affine, fuse_relu=relu,
    )
    flops = 2 * b * d * h * w * 27 * cin * cout
    out = pl.pallas_call(
        kernel,
        grid=(b, nd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xr: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bmat (3, K, 9*sw)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sb (2, lanes_out)
        ],
        out_specs=pl.BlockSpec(
            (1, dt, rows_out, lanes_out),
            lambda bi, di: (bi, di, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, rows_out, lanes_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * (dt + 2), rows_tile, kdim), cd),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * isz + b * d * h * w * cout * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr, bmat, sb)
    return out.reshape(b, d, h, w, cout)


def conv3_dk_mm(x: jax.Array, dy: jax.Array) -> jax.Array:
    """Weight gradient of the 3^3 s1 SAME conv as 27 tap matmuls.

    Measured MEMORY-bound on this chip (each tap re-streams x and dy:
    13.3 ms at L1 vs XLA's 5.3 ms correlation emitter) — kept as an A/B
    switch (HP_CONV3MXU_DK=mm); the default backward uses XLA's native
    wgrad, which is also what the profile shows to be cheap in-situ
    (~3.3 ms for all of layer 1, tpu_jobs/028)."""
    from hiddenpose_tpu.ops.conv_acc import bwd_cast_dtype

    b, d, h, w, ci = x.shape
    co = dy.shape[-1]
    n = b * d * h * w
    cd = bwd_cast_dtype(x.dtype)

    xpad = jnp.pad(
        x.astype(cd), ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))
    )
    dyf = dy.astype(cd).reshape(n, co)
    taps = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                slab = jax.lax.dynamic_slice(
                    xpad, (0, kd, kh, kw, 0), (b, d, h, w, ci)
                ).reshape(n, ci)
                t = jax.lax.dot_general(
                    slab, dyf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                taps.append(jax.lax.optimization_barrier(t))
    return jnp.stack(taps, 0).reshape(3, 3, 3, ci, co)


def _conv3_dk_native(x: jax.Array, k_like: jax.Array,
                     dy: jax.Array) -> jax.Array:
    """dk as ONE conv with batch<->feature swapped dimension numbers (the
    standard wgrad-as-conv form, which XLA lowers to its native weight-
    gradient emitter): lhs x with C_in as the conv batch and B as the
    contracted feature, rhs dy as a D*H*W-sized kernel with B as input
    feature — output spatial extent is exactly 3^3.  Works for f32 AND
    bf16 operands (the vjp formulation trips lax's transpose-rule dtype
    check when the forward accumulates f32 from bf16 operands); always
    accumulates and returns f32."""
    dk = jax.lax.conv_general_dilated(
        x, dy.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("CDHWN", "IDHWO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    # (C_in, kd, kh, kw, C_out) -> (kd, kh, kw, C_in, C_out)
    return jnp.transpose(dk, (1, 2, 3, 0, 4))


@jax.custom_vjp
def conv3_mxu_diff(x: jax.Array, k: jax.Array) -> jax.Array:
    """Differentiable tap-pack conv: Pallas forward; dx through the same
    kernel on the spatially-flipped, in/out-swapped kernel (the exact
    adjoint of a stride-1 SAME conv); dk through XLA's native wgrad."""
    return conv3_mxu(x, k)


def _conv3_native(x: jax.Array, k: jax.Array) -> jax.Array:
    """The base-path forward (torch p=1 SAME, f32 accumulation) — exactly
    what FastConv lowers to when the kernel is not routed, so switching
    routes never changes forward numerics."""
    from hiddenpose_tpu.ops.conv_acc import conv_acc32

    return conv_acc32(
        x, k, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(x.dtype)


@jax.custom_vjp
def conv3_mxu_bwd_diff(x: jax.Array, k: jax.Array) -> jax.Array:
    """Backward-only routing: native XLA forward, MXU tap-pack dx.

    The stacked-layer ablation (tpu_jobs/116-118) showed the Pallas
    forward WINS in isolation (L1 8.5→5.9 ms, L2 3.4→2.2) but LOSES
    composed — +1.4/+5.9/+7.9 ms cumulative regression as backbone stages
    route, i.e. per-boundary layout/fusion cost XLA only pays when the
    custom call sits between its own convs.  The model GRAD meanwhile wins
    routed (267.6→223.4 ms f32), and the grad program's win survives even
    though it embeds the slower routed forward — so the optimal routing is
    asymmetric: keep XLA's conv emitter in the forward program (and the
    primal of the grad program) and take the Pallas kernel only for dx,
    where XLA's 3D conv-backward emitter is at its ~10-15 TF/s worst."""
    return _conv3_native(x, k)


def _conv3b_fwd(x, k):
    return _conv3_native(x, k), (x, k)


def _conv3_fwd(x, k):
    return conv3_mxu(x, k), (x, k)


def _conv3_bwd(res, dy):
    x, k = res
    kadj = jnp.flip(k, (0, 1, 2)).swapaxes(3, 4)
    if conv3mxu_supported(dy.shape, k.shape[4], k.shape[3]):
        dx = conv3_mxu(dy.astype(x.dtype), kadj.astype(x.dtype))
    else:  # e.g. a rectangular conv whose transpose isn't kernel-eligible
        dx = jax.lax.conv_general_dilated(
            dy.astype(x.dtype), kadj.astype(x.dtype), (1, 1, 1),
            [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )
    if os.environ.get("HP_CONV3MXU_DK", "") == "mm":
        dk = conv3_dk_mm(x, dy)
    else:
        dk = _conv3_dk_native(x, k, dy)
    return dx.astype(x.dtype), dk.astype(k.dtype)


conv3_mxu_diff.defvjp(_conv3_fwd, _conv3_bwd)
conv3_mxu_bwd_diff.defvjp(_conv3b_fwd, _conv3_bwd)


def resolve_compute_dtype() -> str:
    """Kernel compute dtype when the caller didn't pin one.

    HP_CONV3MXU_DT wins.  Otherwise: quality consistency — under an
    ambient high/highest matmul precision (cfg.train.matmul_precision,
    the measured learning-quality knob, tpu_jobs/135a) every XLA conv in
    the program runs the multi-pass f32 decomposition, so the kernel must
    not silently stay a one-pass bf16 island inside a quality-mode
    program; 'f32' engages the 3-pass HIGHEST tap-slab matmuls (dx rel
    err 7.9e-7 vs HIGHEST autodiff, tpu_jobs/135b).  Resolved at trace
    time, like the routing itself."""
    forced = os.environ.get("HP_CONV3MXU_DT", "")
    if forced:
        return forced
    from hiddenpose_tpu.ops.pallas.conv3p import kernel_dot_precision

    if kernel_dot_precision() == jax.lax.Precision.HIGHEST:
        return "f32"
    return "bf16"


def conv3mxu_enabled() -> bool:
    """Routing gate for FastConv (trace time): on-TPU, not disabled via
    HP_NO_PALLAS / HP_CONV3MXU=0."""
    import os

    from hiddenpose_tpu.ops.pallas.conv3p import pallas_enabled

    return os.environ.get("HP_CONV3MXU", "1") != "0" and pallas_enabled()


def conv3mxu_route() -> str:
    """Trace-time routing policy for the eligible 3^3 convs.

    '' (kernel off) | 'bwd' (default: native forward, Pallas dx — the
    measured optimum in the composed model, see conv3_mxu_bwd_diff) |
    'full' (Pallas forward + fused BN/ReLU epilogue too — wins on isolated
    blocks; HP_CONV3MXU_ROUTE=full to A/B) | 'island' ('full' plus every
    neighbouring conv reformulated as dot_generals — stride-2 taps-mm,
    1x1 mm, head deconv phase-mm — so the forward has NO XLA convolution
    and layout assignment can't charge boundary copies; round 5, see
    models/posenet3d.py)."""
    if not conv3mxu_enabled():
        return ""
    return _route_policy()


def _route_policy() -> str:
    """Route default, separated from the device gate for CPU testability.

    HP_CONV3MXU_ROUTE wins.  Otherwise 'bwd' (the measured composed
    optimum at default precision) — EXCEPT under an ambient high/highest
    matmul precision, where the economics flip: every XLA conv runs the
    multi-pass f32 decomposition (quality-mode train step 1399 ms vs
    374 ms default — tpu_jobs/137), so the kernel's fixed layout-boundary
    cost is charged against a ~3.5x-slower baseline and the full route
    wins the composed TRAIN step: base 1399 / bwd-f32 1006 / full-f32
    935.5 ms (1.50x, identical loss; tpu_jobs/138).  The quality-mode
    forward is a wash within the relay's ±15% run-to-run band (138's
    interleaved probe: base 321-413 ms vs full 358-409 ms)."""
    r = os.environ.get("HP_CONV3MXU_ROUTE", "")
    if r:
        return r
    from hiddenpose_tpu.ops.pallas.conv3p import kernel_dot_precision

    if kernel_dot_precision() == jax.lax.Precision.HIGHEST:
        return "full"
    return "bwd"
