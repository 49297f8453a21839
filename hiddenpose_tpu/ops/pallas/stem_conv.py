"""Pallas TPU kernel: fused space-to-depth stem convolution.

Computes y2 = relu(conv5x5x5_SAME(x2, k2) * scale + bias) for the s2d-space
stem of PoseNet3D (`models/posenet3d.py::StemS2D`), with BN (running stats)
folded into scale/bias.  One VMEM pass per output tile:

  HBM (pre-padded x2) --DMA--> VMEM tile --im2col--> patch matrix
  --MXU dot (N x 1024 @ 1024 x 512)--> scale/bias/relu --> output tile

Mosaic constraint: DMA slices need a 128-aligned minor dimension, so the
input is stored as (B, D+4, H+4, (W+pad)*8) with (w, channel) folded into
one lane-aligned minor axis; the kernel unfolds it in VMEM.

Only the inference path uses this kernel (training BN needs batch
statistics; the XLA path in StemS2D stays authoritative for gradients).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile (TD, TH, W) spatial positions per program.
TD = 4
TH = 4
KS = 5   # s2d kernel size
CIN = 8  # s2d input channels
PATCH = KS * KS * KS * CIN  # 1000
PATCH_PAD = 1024  # lane-aligned contraction size


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _stem_kernel(x_hbm, k_ref, scale_ref, bias_ref, o_ref, x_tile, patches,
                 sem, *, w_out: int, w_store: int, relu: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TD, TD + 4), pl.ds(j * TH, TH + 4)],
        x_tile,
        sem,
    )
    dma.start()
    dma.wait()

    # Unfold the lane-folded (w, c) axis: (TD+4, TH+4, w_store*8) ->
    # (TD+4, TH+4, w_store, 8).
    xt = x_tile[:, :, :].reshape(TD + 4, TH + 4, w_store, CIN)

    n = TD * TH * w_out
    # Zero the contraction-padding columns: scratch is uninitialised and
    # 0-kernel-row * NaN would poison the dot.
    patches[:, PATCH:] = jnp.zeros((n, PATCH_PAD - PATCH), jnp.float32)
    # im2col: 125 static shifted slices -> contiguous 8-wide column groups.
    for ad in range(KS):
        for ah in range(KS):
            for aw in range(KS):
                off = ((ad * KS + ah) * KS + aw) * CIN
                sl = xt[ad:ad + TD, ah:ah + TH, aw:aw + w_out, :]
                patches[:, off:off + CIN] = sl.reshape(n, CIN)

    out = jnp.dot(
        patches[:, :], k_ref[:, :], preferred_element_type=jnp.float32
    )
    out = out * scale_ref[0, :] + bias_ref[0, :]
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[:] = out.reshape(1, TD, TH, w_out, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu",))
def stem_conv_s2d_pallas(
    x2: jax.Array,
    k2: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool = True,
) -> jax.Array:
    """x2: (B, D2, H2, W2, 8) s2d input; k2: (5, 5, 5, 8, C_out) s2d kernel;
    scale/bias: (C_out,) folded BN affine.  Returns (B, D2, H2, W2, C_out).
    """
    b, d2, h2, w2, cin = x2.shape
    assert cin == CIN and d2 % TD == 0 and h2 % TH == 0
    c_out = k2.shape[-1]

    # SAME pad 2 on d/h/w; pad w further so (w_store * 8) is lane-aligned.
    w_store = _round_up((w2 + 4) * CIN, 128) // CIN
    xp = jnp.pad(
        x2.astype(jnp.float32),
        ((0, 0), (2, 2), (2, 2), (2, w_store - w2 - 2), (0, 0)),
    )
    xp = xp.reshape(b, d2 + 4, h2 + 4, w_store * CIN)

    kf = k2.reshape(PATCH, c_out).astype(jnp.float32)
    kf = jnp.pad(kf, ((0, PATCH_PAD - PATCH), (0, 0)))
    scale2 = scale.reshape(1, c_out).astype(jnp.float32)
    bias2 = bias.reshape(1, c_out).astype(jnp.float32)

    n = TD * TH * w2

    kernel = functools.partial(
        _stem_kernel, w_out=w2, w_store=w_store, relu=relu
    )
    interpret = jax.default_backend() == "cpu"  # CI runs the interpreter
    return pl.pallas_call(
        kernel,
        grid=(b, d2 // TD, h2 // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # folded input, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, TD, TH, w2, c_out), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d2, h2, w2, c_out), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((TD + 4, TH + 4, w_store * CIN), jnp.float32),
            pltpu.VMEM((n, PATCH_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d2 * h2 * w2 * PATCH * c_out,
            bytes_accessed=xp.size * 4 + b * d2 * h2 * w2 * c_out * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, kf, scale2, bias2)
