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
