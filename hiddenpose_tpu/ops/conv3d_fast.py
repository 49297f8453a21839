"""MXU-friendly reformulations of the 3D convolutions in the pose backbone.

XLA's TPU lowering of ``conv_general_dilated`` with three spatial dims is
weak in the *backward* pass on this toolchain (measured at the ResNet
bottleneck shapes, `scripts/tpu_diag_conv.py`, 64^3 b2 f32, one v5e chip):

    1x1x1 c256->64:  fwd 6.3 ms,  dx+dk 11.8 ms   (two matmuls' worth of work)
    3^3 c64->64 s1:  fwd 8.7 ms,  dx+dk 14.0 ms
    3^3 c128 s2:     fwd 7.8 ms,  dx+dk  7.0 ms   (s2 backward is fine)

The 1x1x1 conv IS a matmul — writing it as one (``conv1x1x1_mm``) halves
both passes (fwd 4.0 ms, dx+dk 5.0 ms) because autodiff of a dot_general
produces two dot_generals, which the MXU runs near its layout-bound limit,
instead of a transposed conv + a correlation that the TPU conv emitter
lowers badly.

``conv3x3x3_d2d`` decomposes a k3 conv into three 2D convs over shifted
depth slabs (the TPU 2D conv emitter is the well-tuned one); its autodiff
yields 2D conv backward passes.  Measured standalone it is ~even with the
native forward and slightly behind the native s1 backward at 64^3 — it is
kept for shape experiments and NOT default-routed.

Reference semantics: torch Conv3d(k, s, p=k//2) — explicit (k//2, k//2)
padding per spatial dim (`/root/reference/models/posenet3d_50.py:13-23`).

dtype contract matches ``ops.conv_acc.conv_acc32``'s uniform-dtype rule:
f32 operands accumulate in f32 via ``preferred_element_type``; bf16
operands compute in-dtype (the MXU still accumulates partial products in
f32) and the result is returned in the compute dtype.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def fast_modes() -> frozenset:
    """Trace-time selection of the reformulated lowerings (A/B switch).

    HP_FASTCONV is a comma list of {mm, deconv, d2d}.  Default: OFF — all
    three reformulations WIN standalone (tpu_diag_conv.py) but LOSE
    in-situ (tpu_diag_conv2.py: posenet grad 334 -> 324/353 ms, fwd
    67 -> 80/99 ms): as forward rewrites they insert reshape relayouts and
    break XLA's in-situ conv fusion/layout choices.  Kept as measurement
    switches; the production backward fix is the custom-VJP route (native
    forward, matmul cotangents) — see FastConv."""
    return frozenset(
        m for m in os.environ.get("HP_FASTCONV", "").split(",") if m
    )


def _pref(x):
    return jnp.float32 if x.dtype == jnp.float32 else None


def conv1x1x1_mm(x: jax.Array, k: jax.Array, stride: int = 1) -> jax.Array:
    """1x1x1 conv (NDHWC, torch padding 0) as a flat matmul.

    k: (1, 1, 1, C_in, C_out) — the nn.Conv param shape, so module trees
    are unchanged."""
    if stride != 1:
        x = x[:, ::stride, ::stride, ::stride]
    ci, co = k.shape[3], k.shape[4]
    y = jax.lax.dot_general(
        x.reshape(-1, ci), k.reshape(ci, co),
        (((1,), (0,)), ((), ())),
        preferred_element_type=_pref(x),
    )
    return y.reshape(x.shape[:4] + (co,)).astype(x.dtype)


def conv3x3x3_d2d(x: jax.Array, k: jax.Array, stride: int = 1) -> jax.Array:
    """3^3 conv (NDHWC, torch padding 1) as three 2D convs over depth taps.

    k: (3, 3, 3, C_in, C_out)."""
    b, d, h, w, ci = x.shape
    co = k.shape[4]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    dout = (d + 2 - 3) // stride + 1
    acc = None
    for dz in range(3):
        xz = jax.lax.slice_in_dim(
            xp, dz, dz + (dout - 1) * stride + 1, stride, axis=1
        )
        x2 = xz.reshape(b * dout, h, w, ci)
        y2 = jax.lax.conv_general_dilated(
            x2, k[dz], (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=_pref(x),
        )
        acc = y2 if acc is None else acc + y2
    ho, wo = acc.shape[1], acc.shape[2]
    return acc.reshape(b, dout, ho, wo, co).astype(x.dtype)


def conv3x3x3_taps_mm(x: jax.Array, k: jax.Array, stride: int = 1) -> jax.Array:
    """3^3 conv (NDHWC, torch padding 1) as 27 tap slices + flat matmuls —
    a forward with NO XLA convolution op.

    Built for the 'island' routing mode (round 5): in the Pallas-routed
    posenet forward, XLA's layout assignment gives its own stride-2 convs
    and pool fusions a split channel-major layout and charges a pair of
    full-activation layout copies at every adjacent custom-call boundary
    (round-4 HLO census: +37 copies / +8 ms, tpu_jobs/127).  dot_generals
    keep the default row-major layout, so replacing the three stage-
    transition s2 convs (and any unkernelled s1 3^3) with this form leaves
    layout assignment nothing channel-major to anchor on.  The tap slices
    re-read the activation ~3.4x (vs 27x tap FLOP reuse in a real conv) —
    acceptable because the s2 convs are the smallest in the net; the hot
    s1 convs stay on `ops/pallas/conv3mxu.py`.

    k: (3, 3, 3, C_in, C_out); output extent (v-1)//stride + 1 per axis
    (torch Conv3d(k3, s, p1) convention, `posenet3d_50.py:13-23`)."""
    b, d, h, w, ci = x.shape
    co = k.shape[4]
    do, ho, wo = ((v - 1) // stride + 1 for v in (d, h, w))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    kf = k.reshape(27, ci, co)
    acc = None
    for t in range(27):
        td, th, tw = t // 9, (t // 3) % 3, t % 3
        xs = jax.lax.slice(
            xp,
            (0, td, th, tw, 0),
            (b, td + stride * (do - 1) + 1, th + stride * (ho - 1) + 1,
             tw + stride * (wo - 1) + 1, ci),
            (1, stride, stride, stride, 1),
        )
        y = jax.lax.dot_general(
            xs.reshape(-1, ci), kf[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=_pref(x),
        )
        acc = y if acc is None else acc + y
    return acc.reshape(b, do, ho, wo, co).astype(x.dtype)


def _deconv_fwd_impl(x, k):
    return jax.lax.conv_transpose(
        x, k, (2, 2, 2), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@jax.custom_vjp
def deconv4_s2_diff(x: jax.Array, k: jax.Array) -> jax.Array:
    """ConvTranspose(k4, s2, SAME, NDHWC) with a rewritten backward.

    Forward: the native XLA conv_transpose (its in-situ lowering is fine).
    dx: the exact adjoint as a stride-2 conv of dy with the spatially
    reversed, in/out-swapped kernel and (1, 2) padding — the strided conv
    emitter is well-lowered (tpu_diag_conv.py case c).
    dk: per (output-phase, tap) matmuls with M = C_in (256..2048 — full
    MXU rows), replacing XLA's correlation lowering (~9 ms across the
    head's three deconvs in the train-step backward, profile
    tpu_jobs/005).  Phase extraction of dy uses one phase-major relayout
    (strided slices lower to gather fusions on TPU).

    Index law (delta-probe): y[2i+p] = Σ_m x[i+p+m-1] · k[2m+p] per axis,
    so dk[2m+p] = Σ_i x[i+p+m-1] · dy[2i+p] and
    dx[j] = Σ_t dy[2j-1+t'] · k[3-t'] summed over C_out."""
    return _deconv_fwd_impl(x, k)


def _deconv_fwd(x, k):
    return _deconv_fwd_impl(x, k), (x, k)


def _deconv_bwd(res, dy):
    from hiddenpose_tpu.ops.conv_acc import bwd_cast_dtype

    x, k = res
    b, d, h, w, ci = x.shape
    co = k.shape[4]
    n = b * d * h * w

    # dx: stride-2 conv with reversed, io-swapped kernel, padding (1, 2).
    kr = jnp.flip(k, (0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = jax.lax.conv_general_dilated(
        dy.astype(x.dtype), kr.astype(x.dtype), (2, 2, 2),
        [(1, 2)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=_pref(x),
    ).astype(x.dtype)

    cd = bwd_cast_dtype(x.dtype)
    # Phase-major dy: (B, 2, 2, 2, D, H, W, co) via one relayout.
    dyp = dy.astype(cd).reshape(b, d, 2, h, 2, w, 2, co)
    dyp = jnp.transpose(dyp, (0, 2, 4, 6, 1, 3, 5, 7))
    # x channel-major, padded by 1 per spatial axis (source i + p + m - 1).
    xt = jnp.transpose(x.astype(cd), (4, 0, 1, 2, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))

    dk = [[None] * 16 for _ in range(4)]  # [t_d][t_h*4+t_w]
    for pd in range(2):
        for ph in range(2):
            for pw in range(2):
                dyf = dyp[:, pd, ph, pw].reshape(n, co)
                for md in range(2):
                    for mh in range(2):
                        for mw in range(2):
                            slab = jax.lax.dynamic_slice(
                                xt,
                                (0, 0, pd + md, ph + mh, pw + mw),
                                (ci, b, d, h, w),
                            ).reshape(ci, n)
                            t = jax.lax.dot_general(
                                slab, dyf, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            dk[2 * md + pd][
                                (2 * mh + ph) * 4 + (2 * mw + pw)
                            ] = jax.lax.optimization_barrier(t)
    dk = jnp.stack(
        [jnp.stack(row, axis=0) for row in dk], axis=0
    ).reshape(4, 4, 4, ci, co).astype(k.dtype)
    return dx, dk


deconv4_s2_diff.defvjp(_deconv_fwd, _deconv_bwd)


def conv_transpose4_s2_mm(x: jax.Array, k: jax.Array) -> jax.Array:
    """ConvTranspose(k4, s2, SAME) on NDHWC as 8 phase outputs of 2^3
    tap-matmuls — flax ``nn.ConvTranspose(strides=2, padding='SAME')``
    semantics (output size exactly 2x input; kernel NOT flipped).

    k: (4, 4, 4, C_in, C_out).

    Derivation (delta-probe, scripts history): per axis the output obeys
    y[2i + p] = Σ_{m∈{0,1}} x[i + p + m - 1] · k[2m + p] — a 2-tap
    stencil per output phase p with the kernel effectively flipped.  Each
    (phase, tap) pair is one matmul over C_in; autodiff then emits
    matmuls for dx/dk instead of the TPU 3D conv backward."""
    b, d, h, w, ci = x.shape
    co = k.shape[4]
    km = k.reshape(4, 4, 4, ci, co)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    def tap(pd, ph, pw, md, mh, mw):
        # x[i + p + m - 1] over the 1-padded tensor = slice from p + m.
        sl = jax.lax.dynamic_slice(
            xp, (0, pd + md, ph + mh, pw + mw, 0), (b, d, h, w, ci)
        )
        return sl.reshape(-1, ci)

    phases = []
    for pd in range(2):
        for ph in range(2):
            for pw in range(2):
                acc = None
                for md in range(2):
                    for mh in range(2):
                        for mw in range(2):
                            w_t = km[2 * md + pd, 2 * mh + ph, 2 * mw + pw]
                            y = jax.lax.dot_general(
                                tap(pd, ph, pw, md, mh, mw),
                                w_t.reshape(ci, co),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=_pref(x),
                            )
                            acc = y if acc is None else acc + y
                phases.append(acc.reshape(b, d, h, w, co))
    # Interleave the 8 phase volumes into the 2x output.
    y = jnp.stack(phases, axis=0).reshape(2, 2, 2, b, d, h, w, co)
    y = jnp.transpose(y, (3, 4, 0, 5, 1, 6, 2, 7))
    return y.reshape(b, 2 * d, 2 * h, 2 * w, co).astype(x.dtype)
