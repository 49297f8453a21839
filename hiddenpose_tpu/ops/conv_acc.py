"""f32-accumulating convolution that stays differentiable under bf16.

This JAX version's conv transpose rule rejects mixed operand dtypes: a
``lax.conv_general_dilated`` with bf16 operands and
``preferred_element_type=float32`` produces an f32 cotangent which the
transpose feeds straight back into a conv against the bf16 kernel —
``TypeError: lax.conv_general_dilated requires arguments to have the same
dtypes, got bfloat16, float32`` (observed tracing the 128^3 training
backward in mixed precision; minimal repro in tests/test_bf16_train.py).

``conv_acc32`` keeps the exact f32-accumulation semantics for f32 inputs.
For low-precision inputs it computes the conv in the input dtype — the TPU
MXU still accumulates partial products in f32 internally and rounds once at
the output — and upcasts the result, so downstream normalisation statistics
stay f32 while the transpose sees uniform dtypes.  One output rounding to
bf16 is the standard mixed-precision contract (same as flax.linen.Conv with
``dtype=bfloat16``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def bwd_cast_dtype(dtype) -> jnp.dtype:
    """Operand dtype for the custom-backward matmuls (stem/deconv VJPs).

    On a TPU default device f32 operands are cast to bf16 — matching the
    single-pass bf16 MXU passes the native conv lowering already runs at
    default precision — while accumulation stays f32.  On CPU the exact
    f32 path is kept so equality tests stay bit-strict.

    ``HP_BWD_CAST={bf16,f32}`` overrides the device-based choice so CI can
    exercise the reduced-precision TPU path on CPU (a dk-precision
    regression would otherwise be invisible off-TPU)."""
    if dtype != jnp.float32:
        return dtype
    forced = os.environ.get("HP_BWD_CAST", "")
    if forced == "bf16":
        return jnp.bfloat16
    if forced == "f32":
        return jnp.float32
    from hiddenpose_tpu.ops.pallas.conv3p import on_tpu_default_device

    # NOT flipped by an ambient high/highest matmul precision, unlike the
    # conv3mxu kernel compute dtype (conv3mxu.resolve_compute_dtype):
    # keeping f32 operands through the stem VJP doubles its padded
    # backward buffers in HBM and OOMs the t128 b2 train step outright —
    # measured 17.27G of 15.75G, +20 pad_slice_fusion allocations at
    # 256M apiece (tpu_jobs/137 B).  Quality-mode users who fit a smaller
    # config can still pin HP_BWD_CAST=f32; the default quality mode
    # accepts this one bf16 island (operands only — accumulation is f32
    # everywhere) as the price of fitting on-chip.
    return jnp.bfloat16 if on_tpu_default_device() else jnp.float32


def conv_acc32(
    x: jax.Array,
    kernel: jax.Array,
    strides,
    padding,
    dimension_numbers,
) -> jax.Array:
    """``lax.conv_general_dilated`` returning f32, differentiable for any
    uniform input dtype."""
    if x.dtype == jnp.float32 and kernel.dtype == jnp.float32:
        return jax.lax.conv_general_dilated(
            x, kernel, strides, padding,
            dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
        )
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), strides, padding,
        dimension_numbers=dimension_numbers,
    )
    return out.astype(jnp.float32)
