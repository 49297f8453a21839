"""Shared 3D NN building blocks (flax.linen, channels-last NDHWC).

All volumetric modules in this framework run channels-last — the layout the
TPU convolution engine wants — whereas the reference is NCDHW throughout.
Conversion happens once at the model boundary (see `models/nlospose.py`).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def edge_pad3d(x: jax.Array, pad: int = 1) -> jax.Array:
    """Replication padding on the three spatial axes of (B, D, H, W, C).

    XLA has no native replication-pad fused into conv, so this is an explicit
    `jnp.pad(mode='edge')` that XLA fuses with the consumer
    (reference: `nn.ReplicationPad3d`, `models/ops.py:12,20`).
    """
    p = ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0))
    return jnp.pad(x, p, mode="edge")


def _interp_matrix_align_corners(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix with align_corners=True.

    Used to express trilinear upsampling as three axis matmuls — MXU-friendly
    and bit-matching `nn.Upsample(mode='trilinear', align_corners=True)`
    (`unet/unet3d.py:47`).
    """
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    w_hi = pos - lo
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    mat[np.arange(n_out), lo] += 1.0 - w_hi
    mat[np.arange(n_out), hi] += w_hi
    return mat.astype(np.float32)


def resize_trilinear(x: jax.Array, out_dhw: Tuple[int, int, int]) -> jax.Array:
    """Trilinear resize (align_corners=True) of (B, D, H, W, C) volumes.

    Implemented as three per-axis interpolation matmuls so the work lands on
    the MXU instead of gather units.
    """
    b, d, h, w, c = x.shape
    od, oh, ow = out_dhw
    md = jnp.asarray(_interp_matrix_align_corners(d, od))
    mh = jnp.asarray(_interp_matrix_align_corners(h, oh))
    mw = jnp.asarray(_interp_matrix_align_corners(w, ow))
    x = jnp.einsum("Dd,bdhwc->bDhwc", md, x, preferred_element_type=x.dtype)
    x = jnp.einsum("Hh,bdhwc->bdHwc", mh, x, preferred_element_type=x.dtype)
    x = jnp.einsum("Ww,bdhwc->bdhWc", mw, x, preferred_element_type=x.dtype)
    return x


def max_pool3d(x: jax.Array, window: int, stride: int, pad: int = 0) -> jax.Array:
    """3D max pool over (B, D, H, W, C)."""
    padding = ((pad, pad),) * 3
    return nn.max_pool(
        x, (window,) * 3, strides=(stride,) * 3, padding=padding
    )


kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
kaiming_out_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class Transient2Volumn(nn.Module):
    """Legacy dual-branch encoder: stride-2 learned branch CONCATENATED with
    the corner-mask fixed branch (vs. FeatureExtraction's sum).

    Reference: `models/customer_layers_3.py:18-58` (used by the DeepVoxels
    feature path, `models/feature.py:47-139`).
    """

    basedim: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, D, H, W, 1)
        s = (2, 2, 2)
        h = edge_pad3d(x, 1)
        h = nn.Conv(
            self.basedim, (3, 3, 3), strides=s, padding="VALID",
            dtype=self.dtype, name="conv_in",
        )(h)
        h = ResConv3D(self.basedim, dtype=self.dtype, name="res1")(h)
        h = ResConv3D(self.basedim, dtype=self.dtype, name="res2")(h)

        corner = self.param(
            "corner_kernel", corner_mask_init, (3, 3, 3, x.shape[-1], 1)
        )
        h2 = jax.lax.conv_general_dilated(
            x.astype(self.dtype), corner.astype(self.dtype),
            window_strides=s, padding=((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.concatenate([h2, h], axis=-1)


class SmartConv3D(nn.Module):
    """Stride-1 SAME 3D conv that auto-selects a space-to-depth lowering.

    XLA's TPU conv runs one matmul per kernel tap with C_in as the MXU
    contraction dim; for the low-channel volumes of this pipeline (C_in
    1-8 at 128^3) that is catastrophically inefficient (measured: the
    posenet stem conv7^3 C1→64 at 3 TFLOP/s = 63 ms).  When profitable
    (small C_in, even spatial dims, cubic odd kernel) this module runs the
    algebraically identical s2d form (`ops/space_to_depth.py`).  Param tree
    matches `nn.Conv` ('kernel', 'bias').
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32
    s2d_max_cin: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from hiddenpose_tpu.ops.space_to_depth import conv3d_s2d

        k = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, k, c_in, self.features)
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        even = all(d % 2 == 0 for d in x.shape[1:4])
        if c_in <= self.s2d_max_cin and even and k % 2 == 1:
            y = conv3d_s2d(x, kernel)
        else:
            from hiddenpose_tpu.ops.conv_acc import conv_acc32

            y = conv_acc32(
                x, kernel, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        y = y.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias.astype(self.dtype)
        return y


from hiddenpose_tpu.ops.pallas.conv3p import (
    on_tpu_default_device,
    pallas_enabled,
)


class StencilConv3(nn.Module):
    """One 3^3 stride-1 SAME conv on channels-planes volumes, with fused
    residual/activation — dispatching to the Pallas stencil kernel
    (`ops/pallas/conv3p.py`) on TPU inference, plain XLA otherwise.

    Input/output (B, C, D, H, W).  Param names match nn.Conv ('kernel'
    DHWIO, 'bias')."""

    features: int
    pad_mode: str = "zero"  # 'zero' | 'edge' (ReplicationPad3d)
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, residual=None, act: str = "none",
                 use_pallas: bool = False):
        from hiddenpose_tpu.ops.pallas.conv3p import (
            conv3_planes_diff,
            conv3_planes_xla,
        )

        cin = xp.shape[1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, 3, cin, self.features)
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        eligible = (
            use_pallas
            and xp.shape[-1] <= 128
            # below 32 lanes the padded tile is mostly idle; XLA wins
            # (round-3: the 4D-ref rewrite dodged the Mosaic 5D
            # dynamic-slice bug, so 64- and 32-lane volumes now run the
            # hardware kernel — ROADMAP #4)
            and xp.shape[-1] >= 32
            and xp.shape[-2] % 8 == 0
            # compile-time bound: the kernel body unrolls 27*cin*cout FMAs.
            # 64 admits the UNet's 8->8 and 12->4 convs at 64^3, which the
            # XLA fallback ran at ~0.5 TF/s with C-minor relayout copies
            # around them (UNet infer profile, tpu_jobs/007); Mosaic
            # compile stays seconds-per-config at a 1728-FMA body.
            and cin * self.features <= 64
        )
        if eligible:
            # custom-VJP wrapper: identical kernel forward; the backward
            # runs the Pallas adjoint stencil, so training stays kernelled.
            return conv3_planes_diff(
                xp, kernel, bias, residual, act=act, pad_mode=self.pad_mode
            ).astype(self.dtype)
        # Training / CPU path: plain conv (default MXU precision, like the
        # nn.Conv it replaces) with the same pad/act/residual semantics.
        mode = "edge" if self.pad_mode == "edge" else "constant"
        h = jnp.pad(
            xp.astype(self.dtype),
            ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)), mode=mode,
        )
        from hiddenpose_tpu.ops.conv_acc import conv_acc32

        out = conv_acc32(
            h, kernel.astype(self.dtype), (1, 1, 1), "VALID",
            dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
        )
        if bias is not None:
            out = out + bias.astype(out.dtype)[None, :, None, None, None]
        if residual is not None:
            out = out + residual.astype(out.dtype)
        if act == "relu":
            out = nn.relu(out)
        elif act == "leaky":
            out = nn.leaky_relu(out, negative_slope=0.2)
        return out.astype(self.dtype)


class ResConv3D(nn.Module):
    """Residual block: 2 x (edge-pad + conv k3) with LeakyReLU(0.2).

    Reference: `models/ops.py:7-38` / `models/feature_extraction.py:228-256`.
    Channels-last (B, D, H, W, C) in/out; internally channels-planes so the
    TPU inference path can use the fused Pallas stencil kernel (the
    boundary transposes are free reshapes at C=1, the live config).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_pallas: bool = False) -> jax.Array:
        xp = jnp.transpose(x, (0, 4, 1, 2, 3))
        h = StencilConv3(
            self.features, pad_mode="edge", dtype=self.dtype, name="conv1",
        )(xp, act="leaky", use_pallas=use_pallas)
        y = StencilConv3(
            self.features, pad_mode="edge", dtype=self.dtype, name="conv2",
        )(h, residual=xp, act="leaky", use_pallas=use_pallas)
        return jnp.transpose(y, (0, 2, 3, 4, 1))


def corner_mask_init(key, shape, dtype=jnp.float32):
    """The fixed-branch kernel of FeatureExtraction: ones in the far corner
    octant of a 3^3 kernel, normalised to unit sum — these init values matter
    for parity (`models/feature_extraction.py:141-145`).

    shape: (3, 3, 3, in, out) DHWIO.
    """
    w = np.zeros(shape, dtype=np.float32)
    w[1:, 1:, 1:] = 1.0
    w /= w.sum()
    return jnp.asarray(w, dtype=dtype)


class FeatureExtraction(nn.Module):
    """Dual-branch learned 3D downsampler.

    Learned branch: edge-pad + conv k3 (stride s) + 2 x ResConv3D.
    Fixed-init branch: one conv k3 with the corner-mask kernel (a learnable
    parameter), zero padding, same stride; branches are summed (the fixed
    branch has 1 output channel and broadcasts over ``basedim``).

    Reference: `models/feature_extraction.py:122-171`.
    """

    basedim: int = 1
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, D, H, W, 1)
        from hiddenpose_tpu.ops.pallas.conv3p import conv3_planes_diff

        # Pallas in training too (round 3): StencilConv3 routes through the
        # custom-VJP wrapper, so the backward is the adjoint stencil kernel.
        use_pallas = (
            self.stride == 1
            and pallas_enabled()
            and x.shape[-1] * self.basedim <= 16
            and x.shape[2] % 8 == 0
            # 4D-ref kernels run down to 32 lanes (see StencilConv3)
            and x.shape[3] >= 32
        )
        if use_pallas or self.stride == 1:
            # Channels-planes pipeline: one boundary transpose each way
            # (free at C=1), every conv through StencilConv3.
            xp = jnp.transpose(x, (0, 4, 1, 2, 3))
            h = StencilConv3(
                self.basedim, pad_mode="edge", dtype=self.dtype,
                name="conv_in",
            )(xp, use_pallas=use_pallas)
            h = jnp.transpose(h, (0, 2, 3, 4, 1))
            h = ResConv3D(self.basedim, dtype=self.dtype, name="res1")(
                h, use_pallas=use_pallas
            )
            h = ResConv3D(self.basedim, dtype=self.dtype, name="res2")(
                h, use_pallas=use_pallas
            )
            h = jnp.transpose(h, (0, 4, 1, 2, 3))

            corner = self.param(
                "corner_kernel", corner_mask_init, (3, 3, 3, x.shape[-1], 1)
            )
            if use_pallas:
                # Learned branch rides the kernel's fused residual input —
                # one fewer full-volume pass than a separate h + h2 add.
                res = h if self.basedim == 1 else None
                h2 = conv3_planes_diff(
                    xp.astype(self.dtype), corner.astype(self.dtype),
                    residual=res, pad_mode="zero",
                )
                if res is not None:
                    return jnp.transpose(h2, (0, 2, 3, 4, 1))
            else:
                h2 = jax.lax.conv_general_dilated(
                    xp.astype(self.dtype),
                    corner.astype(self.dtype),
                    window_strides=(1, 1, 1),
                    padding=((1, 1),) * 3,
                    dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
                )
            return jnp.transpose(h + h2, (0, 2, 3, 4, 1))

        s = (self.stride,) * 3
        h = edge_pad3d(x, 1)
        h = nn.Conv(
            self.basedim, (3, 3, 3), strides=s, padding="VALID",
            dtype=self.dtype, name="conv_in",
        )(h)
        h = ResConv3D(self.basedim, dtype=self.dtype, name="res1")(h)
        h = ResConv3D(self.basedim, dtype=self.dtype, name="res2")(h)

        corner = self.param(
            "corner_kernel", corner_mask_init, (3, 3, 3, x.shape[-1], 1)
        )
        h2 = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            corner.astype(self.dtype),
            window_strides=s,
            padding=((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return h + h2
