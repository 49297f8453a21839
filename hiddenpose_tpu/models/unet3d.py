"""3D U-Net denoising autoencoder (channels-last).

Re-design of `/root/reference/unet/unet3d.py:11-118`: 4-level encoder/decoder,
DoubleConv = (conv k3 SAME → GroupNorm(4) → ReLU) x 2, MaxPool3d(2) down,
trilinear (align_corners) x2 up with centre-pad + skip concat, 1x1x1 out conv.
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

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Conv(
                self.features, (3, 3, 3), padding="SAME", dtype=self.dtype,
                name=f"conv{i + 1}",
            )(x)
            x = nn.GroupNorm(num_groups=self.num_groups, name=f"gn{i + 1}")(x)
            x = nn.relu(x)
        return x


class UNet3d(nn.Module):
    """in_channels -> in_channels, width n_channels (reference uses 1 -> 4)."""

    in_channels: int = 1
    n_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, in_channels)
        n = self.n_channels
        dc = lambda f, name: DoubleConv(f, dtype=self.dtype, name=name)

        x1 = dc(n, "conv")(x)
        x2 = dc(2 * n, "enc1")(max_pool3d(x1, 2, 2))
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
        out = up(out, x1, n, "dec4")
        return nn.Conv(
            self.in_channels, (1, 1, 1), dtype=self.dtype, name="out"
        )(out)
