"""2D pose backbone variant + VisibleNet depth-flattening.

Re-design of `/root/reference/models/posenet.py:6-158` (2D ResNet backbone +
2D DeconvHead emitting num_joints*depth_dim depth-sliced heatmaps) and
`models/feature_propagation.py:289-312` (VisibleNet: top-k along depth →
(values, normalised depth) channel stack).  Selected by
cfg.model.backbone == 'posenet2d' (`models/NlosPose.py:41-45`).

Channels-last NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from hiddenpose_tpu.ops.normalize import normalize

Dtype = Any

init_001 = nn.initializers.normal(stddev=0.001)


class BasicBlock2D(nn.Module):
    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            kernel_init=init_001, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name,
        )
        residual = x
        out = nn.relu(bn("bn1")(conv(self.planes, 3, self.stride, "conv1")(x)))
        out = bn("bn2")(conv(self.planes, 3, 1, "conv2")(out))
        if self.use_projection:
            residual = bn("bn_proj")(
                conv(self.planes, 1, self.stride, "conv_proj")(x)
            )
        return nn.relu(out + residual)


class Bottleneck2D(nn.Module):
    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            kernel_init=init_001, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name,
        )
        residual = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out)))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out))
        if self.use_projection:
            residual = bn("bn_proj")(
                conv(self.planes * 4, 1, self.stride, "conv_proj")(x)
            )
        return nn.relu(out + residual)


class ResNetBackbone2D(nn.Module):
    """2D ResNet trunk, init normal(0.001) as the reference chooses
    (`models/posenet.py:84-90`)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = Bottleneck2D if self.block == "bottleneck" else BasicBlock2D
        expansion = 4 if self.block == "bottleneck" else 1

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                    kernel_init=init_001, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_planes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                proj = b == 0 and (s != 1 or in_planes != planes * expansion)
                x = block_cls(
                    planes=planes, stride=s, use_projection=proj,
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                )(x, train=train)
                in_planes = planes * expansion
        return x


class DeconvHead2D(nn.Module):
    """3 x (ConvTranspose k4 s2 + BN + ReLU) + 1x1 conv to
    num_joints * depth_dim depth-sliced heatmap channels
    (`models/posenet.py:6-59`)."""

    num_layers: int = 3
    num_filters: int = 256
    num_joints: int = 24
    depth_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = nn.ConvTranspose(
                self.num_filters, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, kernel_init=init_001, dtype=self.dtype,
                name=f"deconv{i + 1}",
            )(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        return nn.Conv(
            self.num_joints * self.depth_dim, (1, 1), use_bias=True,
            kernel_init=init_001, dtype=self.dtype, name="final",
        )(x)


class ResPoseNet2D(nn.Module):
    """backbone + head; input (B, H, W, C) → (B, h, w, J*depth)
    (`models/posenet.py:123-141`)."""

    num_joints: int = 24
    depth_dim: int = 64
    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNetBackbone2D(self.layers, self.block, self.dtype,
                             name="backbone")(x, train=train)
        return DeconvHead2D(
            num_joints=self.num_joints, depth_dim=self.depth_dim,
            dtype=self.dtype, name="head",
        )(x, train=train)


def visible_net(x: jax.Array, k: int = 4) -> jax.Array:
    """Flatten a 3D feature volume to 2D channels: ReLU → per-channel
    min/max norm → x1e5 → top-k along depth → concat(values, normalised
    flipped depth index) (`models/feature_propagation.py:289-312`).

    x: (B, C, D, H, W) → (B, 2*C*k, H, W).
    """
    x = jax.nn.relu(x)
    x = normalize(x) * 1.0e5
    depth = x.shape[2]
    vals, idx = jax.lax.top_k(jnp.moveaxis(x, 2, -1), k)  # (B,C,H,W,k)
    dep = (depth - 1 - idx.astype(x.dtype)) / (depth - 1)
    vals = jnp.moveaxis(vals, -1, 2).reshape(
        x.shape[0], -1, x.shape[3], x.shape[4]
    )
    dep = jnp.moveaxis(dep, -1, 2).reshape(
        x.shape[0], -1, x.shape[3], x.shape[4]
    )
    return jnp.concatenate([vals, dep], axis=1)
