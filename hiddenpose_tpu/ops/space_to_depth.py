"""Space-to-depth convolution rewrite for low-channel 3D stems.

XLA lowers a spatial convolution as one matmul per kernel tap with the input
channels as the contraction dimension; with C_in = 1 (the NLOS volumes) the
MXU contraction is 1 and the stem conv of PoseNet3D (7x7x7, 1→64 @ 128^3)
runs at ~3 TFLOP/s — measured ~63 ms, half the whole inference pipeline.

The rewrite: block the input 2x2x2 → channels ((B, D/2, H/2, W/2, 8)), build
the algebraically equivalent 5x5x5 kernel over (8 input phases → 8 output
phases x C_out), convolve at half resolution (contraction dim 5^3*8 = 1000),
and unblock.  ~1.5x the nominal flops but ~15-30x faster on the MXU.

Derivation (per axis): XLA SAME correlation reads input j = n - P + t for
output n with padding P = 3; with n = 2m+q and j = 2u+p this gives
t = 2(u-m) + (p-q) + P.  In s2d space u-m = a - anchor, so each 5-tap
half-resolution tap a maps to original tap t = 2(a-anchor) + (p-q) + P —
at most 4 of the 5 taps are non-zero per (q, p) phase pair, and SAME
padding of the 5-tap conv (pad 2) reproduces the original pad-3 halo.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth_3d(x: jax.Array, block: int = 2) -> jax.Array:
    """(B, D, H, W, C) → (B, D/b, H/b, W/b, b^3*C); phase-major channels."""
    b_, d, h, w, c = x.shape
    s = block
    x = x.reshape(b_, d // s, s, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b_, d // s, h // s, w // s, s * s * s * c)


def depth_to_space_3d(x: jax.Array, block: int = 2) -> jax.Array:
    """Inverse of :func:`space_to_depth_3d` (phase-major channels)."""
    b_, d, h, w, pc = x.shape
    s = block
    c = pc // (s * s * s)
    x = x.reshape(b_, d, h, w, s, s, s, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b_, d * s, h * s, w * s, c)


def _s2d_tap_table(k: int) -> np.ndarray:
    """(q, p, a) → original tap t (or -1), for kernel size k (odd), block 2,
    SAME padding; a ranges over the s2d kernel taps (size (k+3)//2 + 1)."""
    pad = (k - 1) // 2
    ks2 = (k + 3) // 2 + ((k + 3) // 2 + 1) % 2  # odd size covering range
    anchor = (ks2 - 1) // 2
    table = np.full((2, 2, ks2), -1, dtype=np.int64)
    for q in range(2):
        for p in range(2):
            for a in range(ks2):
                # XLA SAME correlation: out[n] = sum_t in[n - pad + t] k[t]
                # with n = 2m+q, in index j = 2u+p, s2d offset u-m = a-anchor:
                # t = 2(a - anchor) + (p - q) + pad.
                t = 2 * (a - anchor) + p - q + pad
                if 0 <= t < k:
                    table[q, p, a] = t
    return table


def make_s2d_kernel(kernel: jax.Array) -> jax.Array:
    """(k, k, k, C_in, C_out) → (k2, k2, k2, 8*C_in, 8*C_out) equivalent
    kernel in phase-major s2d space."""
    k = kernel.shape[0]
    tab = _s2d_tap_table(k)
    ks2 = tab.shape[-1]
    c_in, c_out = kernel.shape[3], kernel.shape[4]

    # Gather with a zero row for invalid taps.
    kz = jnp.concatenate(
        [kernel, jnp.zeros((1,) + kernel.shape[1:], kernel.dtype)], axis=0
    )
    kz = jnp.concatenate(
        [kz, jnp.zeros((kz.shape[0], 1) + kz.shape[2:], kernel.dtype)], axis=1
    )
    kz = jnp.concatenate(
        [kz, jnp.zeros(kz.shape[:2] + (1,) + kz.shape[3:], kernel.dtype)],
        axis=2,
    )
    idx = jnp.asarray(np.where(tab < 0, k, tab))  # (2, 2, ks2)

    # out[a_d,a_h,a_w, (p_d p_h p_w c_in), (q_d q_h q_w c_out)]
    #   = kernel[t_d, t_h, t_w, c_in, c_out]
    td = idx[:, :, :, None, None, None, None, None, None]          # q_d p_d a_d
    th = idx[None, None, None, :, :, :, None, None, None]          # q_h p_h a_h
    tw = idx[None, None, None, None, None, None, :, :, :]          # q_w p_w a_w
    big = kz[td, th, tw]  # (2,2,ks2, 2,2,ks2, 2,2,ks2, C_in, C_out)
    # reorder to (a_d, a_h, a_w, p_d, p_h, p_w, C_in, q_d, q_h, q_w, C_out)
    big = big.transpose(2, 5, 8, 1, 4, 7, 9, 0, 3, 6, 10)
    return big.reshape(ks2, ks2, ks2, 8 * c_in, 8 * c_out)


def phase_maxpool_k3s2(y2: jax.Array) -> jax.Array:
    """MaxPool3d(kernel 3, stride 2, pad 1) evaluated directly in s2d space.

    y2: (B, D/2, H/2, W/2, 8*C) phase-major — the s2d-space output of a
    stride-1 conv over the full-resolution volume.  The pooled output at
    position m covers original indices {2m-1, 2m, 2m+1}, i.e. per axis the
    candidates (block m, phase 0), (block m, phase 1), (block m-1, phase 1)
    — so the pool is a separable 3-way max over shifted phase slices,
    avoiding the depth-to-space materialisation of the full-resolution
    tensor.  Returns (B, D/2, H/2, W/2, C).

    TPU layout note (the round-1 "stem residue"): this used to reshape the
    trailing 8*C axis to (2, 2, 2, C), which SPLITS the lane dimension —
    at the stem's (64^3, 512) output that is a full ~0.5 GB relayout and
    cost 15-20 ms.  Phases are instead addressed as static C-wide LANE
    RANGES of the (..., 8*C) tensor, so the whole pool is slices, spatial
    shifts and maxes that XLA fuses into one pass, with the layout intact.
    """
    b, d, h, w, pc = y2.shape
    c = pc // 8
    neg_inf = jnp.asarray(-jnp.inf, y2.dtype)

    def phase(pd, ph, pw):
        p = (pd * 2 + ph) * 2 + pw
        return y2[..., p * c:(p + 1) * c]

    def shift(t, axis):
        """One block forward along a spatial axis (-inf fill at the front:
        the m-1 candidate of output block 0 lies outside the volume)."""
        pad = [(0, 0)] * t.ndim
        pad[axis] = (1, 0)
        t = jnp.pad(t, pad, constant_values=neg_inf)
        sl = [slice(None)] * t.ndim
        sl[axis] = slice(0, t.shape[axis] - 1)
        return t[tuple(sl)]

    # Separable per-axis max: w first (innermost), then h, then d.  Each
    # stage keeps phase-major lane ranges for the remaining axes.
    def axis_reduce(get, axis):
        """get(p) -> tensor for phase bit p of `axis`; 3 candidates."""
        a0, a1 = get(0), get(1)
        return jnp.maximum(jnp.maximum(a0, a1), shift(a1, axis))

    def w_stage(pd, ph):
        return axis_reduce(lambda pw: phase(pd, ph, pw), axis=3)

    def h_stage(pd):
        return axis_reduce(lambda ph: w_stage(pd, ph), axis=2)

    return axis_reduce(h_stage, axis=1)


def _stem_conv_fwd_impl(x2: jax.Array, k2: jax.Array) -> jax.Array:
    from hiddenpose_tpu.ops.conv_acc import conv_acc32

    return conv_acc32(
        x2, k2, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@jax.custom_vjp
def conv_s2d_stem_diff(x2: jax.Array, k2: jax.Array) -> jax.Array:
    """The stem's s2d conv (stride-1 SAME, odd kernel, NDHWC) with a
    rewritten backward.

    XLA's native weight-gradient for this conv — correlation of the
    C_in=8 s2d input against the 512-channel cotangent — lowers to the
    `InputFeaturePackedInSublanes` TPU emitter running one matmul per tap
    with M=8 of 128 MXU rows: measured **47.7 ms** of the 328 ms PoseNet3D
    backward at 128^3 b2 (profiled via tpu_diag_prof.py; the single
    hottest op of the whole train step).  The custom backward instead
    materialises the 125-tap im2col patch matrix once ((N, 1000), bf16 —
    the native lowering also feeds the MXU bf16) and computes
    dk = dyᵀ @ patches as ONE full-M matmul: ~537 GFLOP at full row
    utilisation plus ~2 GB of traffic ≈ 8 ms.

    dx keeps a native conv but phrased as the stride-1 SAME conv with the
    spatially-flipped, in/out-swapped kernel, which uses the ordinary
    forward emitter (M = N rows) instead of the transposed-conv path.
    """
    return _stem_conv_fwd_impl(x2, k2)


def _stem_conv_fwd(x2, k2):
    return _stem_conv_fwd_impl(x2, k2), (x2, k2)


def _stem_dx_mm(x2, k2, dy):
    """Input gradient of the stride-1 SAME stem conv via channel-major
    matmuls + shifted sublane-slab accumulation (see _stem_conv_bwd)."""
    from hiddenpose_tpu.ops.conv_acc import bwd_cast_dtype

    ks = k2.shape[0]
    p = ks // 2
    ci, co = k2.shape[3], k2.shape[4]
    b, d, h, w, _ = x2.shape
    cd = bwd_cast_dtype(x2.dtype)
    # dy transposed channel-major and spatially padded by p (padded index
    # j holds dy[j - p]; the tap-t contribution to dx[m] reads dy[m+p-t]
    # = dyp[m + 2p - t], slice starts 2p - t ∈ [0, ks-1]).
    dyp = jnp.transpose(dy.astype(cd), (4, 0, 1, 2, 3))
    dyp = jnp.pad(dyp, ((0, 0), (0, 0), (p, p), (p, p), (p, p)))
    dp, hp, wp = d + 2 * p, h + 2 * p, w + 2 * p
    k2m = k2.astype(cd).reshape(ks * ks * ks * ci, co)

    dx = None
    for a in range(ks):
        rows = k2m[a * ks * ks * ci:(a + 1) * ks * ks * ci]
        u = jax.lax.dot_general(
            rows, dyp.reshape(co, b * dp * hp * wp),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd).reshape(ks * ks * ci, b, dp, hp, wp)
        u = jax.lax.optimization_barrier(u)
        for bh in range(ks):
            for cw in range(ks):
                t = bh * ks + cw
                slab = jax.lax.dynamic_slice(
                    u,
                    (t * ci, 0, 2 * p - a, 2 * p - bh, 2 * p - cw),
                    (ci, b, d, h, w),
                )
                dx = slab.astype(jnp.float32) if dx is None \
                    else dx + slab.astype(jnp.float32)
    return jnp.transpose(dx, (1, 2, 3, 4, 0)).astype(x2.dtype)


def _stem_conv_bwd(res, dy):
    x2, k2 = res
    ks = k2.shape[0]
    p = ks // 2
    ci, co = k2.shape[3], k2.shape[4]
    b, d, h, w, _ = x2.shape
    n = b * d * h * w

    # dx as planes-layout matmuls.  The conv form (flipped kernel, in/out
    # swapped) is fine standalone (12.9 ms) but IN-SITU XLA picks an
    # emitter that puts the 8 output channels on lanes — measured
    # **135 ms** for the same op inside the full-model backward (the
    # hottest op of the whole train step after the dk fix).  Instead:
    #   U[t·ci+c, j] = Σ_co k2[t, c, co] · dy_pad[co, j]   (full-M dots)
    #   dx[c, m]     = Σ_t U[t·ci+c, m + 2p − t]           (sublane slabs)
    # Everything lives channel-/tap-major, so slab reads are full 8-row
    # sublane tiles and no 8-wide lane tensor is ever materialised.
    dx = _stem_dx_mm(x2, k2, dy)

    # bf16 operands match the MXU passes the native conv already runs for
    # f32 inputs; accumulation stays f32.  On CPU (tests) keep f32 exact
    # unless HP_BWD_CAST forces the TPU path (see conv_acc.bwd_cast_dtype).
    from hiddenpose_tpu.ops.conv_acc import bwd_cast_dtype

    cd = bwd_cast_dtype(x2.dtype)
    # Patch rows are built CHANNEL-MAJOR: one upfront transpose of the
    # C_in=8 input to (ci, b, d, h, w) and every tap slab/concat then
    # lives in full-lane layouts.  (Channels-last slabs of an 8-channel
    # tensor tile as T(8,128) with 8 of 128 lanes live — the first
    # attempt's pad/slice/concat fusions ran at ~38 GB/s and cost ~75 ms.)
    # One patch group per leading (depth) tap keeps the live patch buffer
    # at ~0.2 GB — the full (N, 1000) matrix plus its layout copy blew the
    # 15.75 GB HBM budget in-situ (the stem backward sits at the liveness
    # peak of the whole-model backward); groups have disjoint outputs, so
    # there is no accumulation across them.  The (taps*ci, co) result
    # orientation makes the trailing kernel-shape reshape free, and the
    # optimization_barrier stops XLA from fusing the dot into the
    # make_s2d_kernel gather-backward that consumes dk — without it the
    # compiler restructured the matmul into a 7-D contraction over the
    # patch matrix with two extra full-size copies (~30 ms; profiled in
    # tpu_diag_stemvjp.py).
    xt = jnp.transpose(x2.astype(cd), (4, 0, 1, 2, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (p, p), (p, p), (p, p)))
    dyf = dy.astype(cd).reshape(n, co)
    groups = []
    for a in range(ks):
        slabs = [
            jax.lax.dynamic_slice(xt, (0, 0, a, bh, cw), (ci, b, d, h, w))
            for bh in range(ks) for cw in range(ks)
        ]
        pat_t = jnp.concatenate(slabs, axis=0).reshape(ks * ks * ci, n)
        dk_a = jax.lax.dot_general(
            pat_t, dyf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        groups.append(jax.lax.optimization_barrier(dk_a))
    dk = jnp.concatenate(groups, axis=0)
    dk = dk.reshape(ks, ks, ks, ci, co).astype(k2.dtype)
    return dx, dk


conv_s2d_stem_diff.defvjp(_stem_conv_fwd, _stem_conv_bwd)


def _stem_raw_fwd_impl(x, k2):
    from hiddenpose_tpu.ops.pallas.stem_conv import stem_conv_raw_pallas

    c_out = k2.shape[-1]
    one = jnp.ones((c_out,), jnp.float32)
    zero = jnp.zeros((c_out,), jnp.float32)
    return stem_conv_raw_pallas(x, k2, one, zero, relu=False)


@jax.custom_vjp
def conv_stem_raw_diff(x: jax.Array, k2: jax.Array) -> jax.Array:
    """Training-path stem conv straight from the RAW volume: the fused
    Pallas kernel forward (affine disabled — exact-f32 conv whose output
    is already in the phase-pool kernel's layout, saving the two ~3.3 ms
    relayout fusions the XLA conv output needed) with the same
    matmul-form backward as :func:`conv_s2d_stem_diff` (the s2d input is
    a permutation of the raw volume, recomputed in the backward).

    x (B, D, H, W, 1) -> (B, D/2, H/2, W/2, 8*C_out-equivalent s2d
    output); only valid on shapes the kernel supports (W/2 == 64)."""
    return _stem_raw_fwd_impl(x, k2)


def _stem_raw_fwd(x, k2):
    return _stem_raw_fwd_impl(x, k2), (x, k2)


def _stem_raw_bwd(res, dy):
    x, k2 = res
    x2 = space_to_depth_3d(x)
    dx2, dk = _stem_conv_bwd((x2, k2), dy)
    return depth_to_space_3d(dx2).astype(x.dtype), dk


conv_stem_raw_diff.defvjp(_stem_raw_fwd, _stem_raw_bwd)


def conv3d_s2d(
    x: jax.Array,
    kernel: jax.Array,
    preferred_element_type=jnp.float32,
) -> jax.Array:
    """Stride-1 SAME 3D convolution via space-to-depth.

    x: (B, D, H, W, C_in) with even D/H/W; kernel (k, k, k, C_in, C_out),
    odd k.  Returns (B, D, H, W, C_out), numerically equal to
    `lax.conv_general_dilated(x, kernel, SAME)`.
    """
    x2 = space_to_depth_3d(x)
    k2 = make_s2d_kernel(kernel).astype(x2.dtype)
    if preferred_element_type == jnp.float32:
        from hiddenpose_tpu.ops.conv_acc import conv_acc32

        y2 = conv_acc32(
            x2, k2, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    else:
        y2 = jax.lax.conv_general_dilated(
            x2, k2, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=preferred_element_type,
        )
    return depth_to_space_3d(y2)
