"""3D U-Net denoising autoencoder (channels-last).

Re-design of `/root/reference/unet/unet3d.py:11-118`: 4-level encoder/decoder,
DoubleConv = (conv k3 SAME → GroupNorm(4) → ReLU) x 2, MaxPool3d(2) down,
trilinear (align_corners) x2 up with centre-pad + skip concat, 1x1x1 out conv.

TPU note: the full-resolution level (128^3 at 1-4 channels) is
layout-hostile under XLA (lane padding of tiny channel counts); with
``s2d_top`` the top level runs in 2x2x2 space-to-depth coordinates —
algebraically identical (same parameters, see `ops/space_to_depth.py`), but
the convs contract over 8x the channels at 1/8 the positions, the 2^3
maxpool becomes a pure phase-max, and the skip tensor never materialises at
full resolution.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from hiddenpose_tpu.models.blocks import max_pool3d, resize_trilinear

Dtype = Any


class DoubleConv(nn.Module):
    features: int
    num_groups: int = 4
    dtype: Dtype = jnp.float32
    # Compute in s2d coordinates: expects (B, D/2, H/2, W/2, 8*C_in)
    # phase-major input, produces (..., 8*features).  Parameters are the
    # NATIVE (3,3,3,C_in,features) kernels either way.
    s2d_space: bool = False

    @nn.compact
    def __call__(self, x):
        from hiddenpose_tpu.ops.space_to_depth import make_s2d_kernel

        for i in range(2):
            if self.s2d_space:
                c_in = x.shape[-1] // 8
                kernel = self.param(
                    f"conv{i + 1}_kernel",
                    nn.initializers.lecun_normal(),
                    (3, 3, 3, c_in, self.features),
                )
                bias = self.param(
                    f"conv{i + 1}_bias", nn.initializers.zeros,
                    (self.features,),
                )
                k2 = make_s2d_kernel(kernel.astype(self.dtype))
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), k2, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32,
                )
                b_, d_, h_, w_, _ = x.shape
                x = x.reshape(b_, d_, h_, w_, 8, self.features)
                x = x + bias.astype(x.dtype)
                x = nn.GroupNorm(
                    num_groups=self.num_groups, name=f"gn{i + 1}"
                )(x)
                x = nn.relu(x).reshape(b_, d_, h_, w_, 8 * self.features)
                x = x.astype(self.dtype)
            else:
                x = nn.Conv(
                    self.features, (3, 3, 3), padding="SAME",
                    dtype=self.dtype, name=f"conv{i + 1}",
                )(x)
                x = nn.GroupNorm(
                    num_groups=self.num_groups, name=f"gn{i + 1}"
                )(x)
                x = nn.relu(x)
        return x


class UNet3d(nn.Module):
    """in_channels -> in_channels, width n_channels (reference uses 1 -> 4)."""

    in_channels: int = 1
    n_channels: int = 4
    dtype: Dtype = jnp.float32
    # Measured on v5e (128^3 b2): native 30 ms vs s2d-top 48 ms — unlike the
    # posenet's 7^3 stem, XLA's lowering of 3^3 low-channel convs beats the
    # s2d rewrite (the (.., 8, C) relayouts dominate).  Kept as an option;
    # default off.
    s2d_top: bool = False

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, in_channels)
        from hiddenpose_tpu.ops.space_to_depth import space_to_depth_3d

        n = self.n_channels
        dc = lambda f, name: DoubleConv(f, dtype=self.dtype, name=name)

        use_s2d = (
            self.s2d_top
            and all(d % 2 == 0 and d >= 16 for d in x.shape[1:4])
        )

        if use_s2d:
            xs = space_to_depth_3d(x)  # (B, D/2, H/2, W/2, 8*C_in)
            x1s = DoubleConv(
                n, dtype=self.dtype, s2d_space=True, name="conv"
            )(xs)  # (..., 8n) phase-major
            b_, d_, h_, w_, _ = x1s.shape
            # MaxPool(2,2) over the original grid = max over the phase axis.
            pooled = x1s.reshape(b_, d_, h_, w_, 8, n).max(axis=4)
            x1 = None
        else:
            x1 = dc(n, "conv")(x)
            pooled = max_pool3d(x1, 2, 2)

        x2 = dc(2 * n, "enc1")(pooled)
        x3 = dc(4 * n, "enc2")(max_pool3d(x2, 2, 2))
        x4 = dc(8 * n, "enc3")(max_pool3d(x3, 2, 2))
        x5 = dc(8 * n, "enc4")(max_pool3d(x4, 2, 2))

        def up(lo, skip, f, name):
            # Trilinear x2 upsample, centre-pad to the skip's shape, concat.
            # (unet/unet3d.py:53-62)
            lo = resize_trilinear(
                lo, (2 * lo.shape[1], 2 * lo.shape[2], 2 * lo.shape[3])
            )
            pads = [(0, 0)]
            for ax in (1, 2, 3):
                diff = skip.shape[ax] - lo.shape[ax]
                pads.append((diff // 2, diff - diff // 2))
            pads.append((0, 0))
            lo = jnp.pad(lo, pads)
            return dc(f, name)(jnp.concatenate([skip, lo], axis=-1))

        out = up(x5, x4, 4 * n, "dec1")
        out = up(out, x3, 2 * n, "dec2")
        out = up(out, x2, n, "dec3")

        if use_s2d:
            # Top decoder level in s2d space: upsample natively at small
            # channel count, s2d, concat per-phase with the s2d skip.
            lo = resize_trilinear(
                out, (2 * out.shape[1], 2 * out.shape[2], 2 * out.shape[3])
            )
            los = space_to_depth_3d(lo)  # (..., 8n)
            b_, d_, h_, w_, _ = los.shape
            cat = jnp.concatenate(
                [
                    x1s.reshape(b_, d_, h_, w_, 8, n),
                    los.reshape(b_, d_, h_, w_, 8, n),
                ],
                axis=-1,
            ).reshape(b_, d_, h_, w_, 8 * 2 * n)
            out = DoubleConv(
                n, dtype=self.dtype, s2d_space=True, name="dec4"
            )(cat)  # (..., 8n)
            # 1x1x1 out conv in s2d space: per-phase shared weights.
            w_out = self.param(
                "out_kernel", nn.initializers.lecun_normal(),
                (1, 1, 1, n, self.in_channels),
            )
            b_out = self.param(
                "out_bias", nn.initializers.zeros, (self.in_channels,)
            )
            y = jnp.einsum(
                "bdhwpc,co->bdhwpo",
                out.reshape(b_, d_, h_, w_, 8, n).astype(self.dtype),
                w_out[0, 0, 0].astype(self.dtype),
            ) + b_out.astype(self.dtype)
            from hiddenpose_tpu.ops.space_to_depth import depth_to_space_3d

            return depth_to_space_3d(
                y.reshape(b_, d_, h_, w_, 8 * self.in_channels)
            )

        out = up(out, x1, n, "dec4")
        return nn.Conv(
            self.in_channels, (1, 1, 1), dtype=self.dtype, name="out"
        )(out)
