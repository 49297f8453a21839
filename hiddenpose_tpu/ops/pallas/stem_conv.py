"""Pallas TPU kernel: fused space-to-depth stem convolution.

Computes y2 = relu(conv5x5x5_SAME(x2, k2) * scale + bias) for the s2d-space
stem of PoseNet3D (`models/posenet3d.py::StemS2D`), with BN (running stats)
folded into scale/bias.

Mosaic-legal construction (this toolchain rejects any lane-splitting
reshape; transposes, narrow/offset lane slices and leading/sublane merges
are fine — see BENCH_NOTES.md):

* input is stored channel-planes-first (B, 8, D+4, H+4, 128-lane W) so the
  per-tile DMA slices only non-minor dims;
* im2col builds a transposed patch tensor (1024 rows = (tap, c_in),
  16 = (d, h), 64 lanes = w) from 125 shifted slices — each write merges
  leading dims only;
* the contraction runs as 16 MXU matmuls (C_out x 1024) @ (1024 x 64), one
  per (d, h) row of the tile, with the folded BN affine and ReLU applied on
  the (C_out, 64) result and a final 2-D transpose into the output layout.

Only the inference path uses this kernel (training BN needs batch
statistics; the XLA path in StemS2D stays authoritative for gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TD = 4
TH = 4
KS = 5   # s2d kernel size
CIN = 8  # s2d input channels
PATCH = KS * KS * KS * CIN  # 1000
PATCH_PAD = 1024


def _paired_enabled() -> bool:
    """Gate for the 128-lane paired-d-planes matmul packing (default ON).

    The round-3 hardware bisection (tpu_diag_stem_paired) cleared the
    packing: the paired im2col store and the offset-lane transpose epilogue
    are exact on-chip, and the 2.3e-3 once blamed on a Mosaic mis-lowering
    is the in-kernel f32 `jnp.dot`'s inherent default-precision bf16-pass
    rounding (identical at N=64 and N=128).  Re-validated on the production
    shape (tpu_validate_stem_paired): paired == unpaired == XLA-default
    BIT-EXACT (rel 0.0), stem 19.55 -> 15.33 ms.  HP_STEM_PAIRED=0 falls
    back for A/B."""
    import os

    return os.environ.get("HP_STEM_PAIRED", "1") != "0"


def _stem_kernel(x_hbm, kt_ref, scale_ref, bias_ref, o_ref, x_tile, patches,
                 sem, *, w_out: int, relu: bool, dot_bf16: bool,
                 paired_ok: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * TD, TD + 4), pl.ds(j * TH, TH + 4)],
        x_tile,
        sem,
    )
    dma.start()
    dma.wait()

    paired = w_out == 64 and paired_ok  # pack 2 d-planes per matmul

    # Zero the contraction-padding rows once (uninitialised scratch).
    n_cols = TD // 2 * TH if paired else TD * TH
    n_lanes = 128 if paired else w_out
    patches[PATCH:, :, :] = jnp.zeros(
        (PATCH_PAD - PATCH, n_cols, n_lanes), jnp.float32
    )

    # im2col (transposed): rows = (tap, c_in).
    # Round-2 left the MXU half idle: one matmul per (d, h) position put
    # only w_out = 64 of 128 lanes to work (ROADMAP #1).  Packed layout:
    # cols = (d-pair, h), lanes = (d-lsb, w) — two consecutive d planes
    # share one 128-lane matmul, so N is fully utilised.  The per-tap
    # write splits into TD single-plane copies (leading-dim indexing only;
    # no lane-splitting reshapes — Mosaic-legal on this toolchain).
    for ad in range(KS):
        for ah in range(KS):
            for aw in range(KS):
                off = ((ad * KS + ah) * KS + aw) * CIN
                if paired:
                    for dd in range(TD):
                        d2, lsb = dd // 2, dd % 2
                        patches[
                            off:off + CIN, d2 * TH:(d2 + 1) * TH,
                            lsb * 64:(lsb + 1) * 64,
                        ] = x_tile[:, ad + dd, ah:ah + TH, aw:aw + w_out]
                else:
                    sl = x_tile[:, ad:ad + TD, ah:ah + TH, aw:aw + w_out]
                    patches[off:off + CIN, :, :] = sl.reshape(
                        CIN, TD * TH, w_out
                    )

    # MXU matmuls: (C_out, 1024) @ (1024, n_lanes), + affine + relu.
    kt = kt_ref[:, :]
    if dot_bf16:
        kt = kt.astype(jnp.bfloat16)

    def matmul(cols):
        if dot_bf16:
            # bf16 inputs, f32 accumulation: 2x MXU throughput at
            # ~0.4% rel error — the same trade XLA's default-precision
            # convs make everywhere else in the network.
            cols = cols.astype(jnp.bfloat16)
        from hiddenpose_tpu.ops.pallas.conv3p import kernel_dot_precision

        out = jnp.dot(kt, cols, preferred_element_type=jnp.float32,
                      precision=kernel_dot_precision())
        out = out * scale_ref[:, 0:1] + bias_ref[:, 0:1]
        if relu:
            out = jnp.maximum(out, 0.0)
        return out

    if paired:
        for p in range(TD // 2 * TH):
            d2, h = p // TH, p % TH
            out = matmul(patches[:, p, :])  # (C_out, 128)
            o_ref[0, 2 * d2, h, :, :] = out[:, 0:64].T.astype(o_ref.dtype)
            o_ref[0, 2 * d2 + 1, h, :, :] = (
                out[:, 64:128].T.astype(o_ref.dtype)
            )
    else:
        for d in range(TD):
            for h in range(TH):
                out = matmul(patches[:, d * TH + h, :])
                o_ref[0, d, h, :, :] = out.T.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "dot_bf16", "paired"))
def stem_conv_raw_pallas(
    x: jax.Array,
    k2: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool = True,
    dot_bf16: bool = False,
    paired: bool | None = None,
) -> jax.Array:
    """Full-resolution entry: x (B, D, H, W, 1) raw volume → one fused
    transpose builds the channel-planes layout directly (the same single
    relayout the XLA s2d path pays), then the kernel runs.  Returns the
    s2d-space result (B, D/2, H/2, W/2, C_out)."""
    b, d, h, w, c = x.shape
    assert c == 1
    # Barrier: without it the in-situ compiler fuses the producer into the
    # s2d transpose at a layout that then needs a fixup copy — measured
    # ~7.8 ms for this chain inside the e2e forward vs ~4 ms standalone
    # (tpu_jobs/020/022).
    x = jax.lax.optimization_barrier(x)
    xp = x.astype(jnp.float32).reshape(b, d // 2, 2, h // 2, 2, w // 2, 2)
    xp = xp.transpose(0, 2, 4, 6, 1, 3, 5).reshape(
        b, 8, d // 2, h // 2, w // 2
    )
    w2 = w // 2
    xp = jnp.pad(xp, ((0, 0), (0, 0), (2, 2), (2, 2), (2, 128 - w2 - 2)))
    return _stem_call(xp, k2, scale, bias, relu, x.dtype, w2, dot_bf16,
                      paired)


@functools.partial(jax.jit, static_argnames=("relu", "dot_bf16", "paired"))
def stem_conv_s2d_pallas(
    x2: jax.Array,
    k2: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool = True,
    dot_bf16: bool = False,
    paired: bool | None = None,
) -> jax.Array:
    """x2: (B, D2, H2, W2, 8) s2d input; k2: (5, 5, 5, 8, C_out) s2d kernel;
    scale/bias: (C_out,) folded BN affine.  Returns (B, D2, H2, W2, C_out).
    """
    b, d2, h2, w2, cin = x2.shape
    assert cin == CIN

    # Channel-planes layout with SAME pad 2 and a 128-lane W axis.
    xp = jnp.transpose(x2.astype(jnp.float32), (0, 4, 1, 2, 3))
    xp = jnp.pad(
        xp, ((0, 0), (0, 0), (2, 2), (2, 2), (2, 128 - w2 - 2))
    )  # (B, 8, D2+4, H2+4, 128)
    return _stem_call(xp, k2, scale, bias, relu, x2.dtype, w2, dot_bf16,
                      paired)


def _stem_call(xp, k2, scale, bias, relu, out_dtype, w2, dot_bf16=False,
               paired=None):
    if paired is None:
        paired = _paired_enabled()
    b = xp.shape[0]
    d2, h2 = xp.shape[2] - 4, xp.shape[3] - 4
    assert d2 % TD == 0 and h2 % TH == 0
    assert w2 + 4 <= 128, "W lane window exceeds one 128-lane tile"
    c_out = k2.shape[-1]

    kf = k2.reshape(PATCH, c_out).astype(jnp.float32)
    kt = jnp.pad(kf, ((0, PATCH_PAD - PATCH), (0, 0))).T  # (C_out, 1024)
    scale2 = scale.reshape(c_out, 1).astype(jnp.float32)
    bias2 = bias.reshape(c_out, 1).astype(jnp.float32)

    from hiddenpose_tpu.ops.pallas.conv3p import on_tpu_default_device

    kernel = functools.partial(_stem_kernel, w_out=w2, relu=relu,
                               dot_bf16=dot_bf16, paired_ok=paired)
    interpret = not on_tpu_default_device()  # CI runs the interpreter
    return pl.pallas_call(
        kernel,
        grid=(b, d2 // TD, h2 // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # channel planes, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel (C_out, 1024)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale (C_out, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias  (C_out, 1)
        ],
        out_specs=pl.BlockSpec(
            (1, TD, TH, w2, c_out), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d2, h2, w2, c_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((CIN, TD + 4, TH + 4, 128), jnp.float32),
            pltpu.VMEM(
                (PATCH_PAD, TD // 2 * TH, 128)
                if (w2 == 64 and paired)
                else (PATCH_PAD, TD * TH, w2),
                jnp.float32,
            ),
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
    )(xp, kt, scale2, bias2)
