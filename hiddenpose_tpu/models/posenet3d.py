"""3D ResNet-50 pose backbone + 3D deconvolution head (channels-last).

Re-design of `/root/reference/models/posenet3d_50.py:26-318`:
Kinetics-style 3D ResNet (Bottleneck [3,4,6,3], widths [64,128,256,512],
conv1 k7 stride 1, maxpool k3 s2, stages 2-4 stride 2) followed by a
DeconvHead of 3 stride-2 transposed convs (256 filters, k4) and a 1x1x1 conv
to ``num_joints`` heatmap channels.  128^3 input -> (64^3, num_joints) output.

Initialisation parity notes (posenet3d_50.py:138-147, 207-214): every Conv3d
(including the head's final conv — the reference's global init loop runs after
head construction) is kaiming-normal fan_out; ConvTranspose3d keeps
normal(std=0.001); BatchNorm scale 1 / bias 0.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from hiddenpose_tpu.models.blocks import (
    SmartConv3D,
    kaiming_out_normal,
    max_pool3d,
)

Dtype = Any

deconv_init = nn.initializers.normal(stddev=0.001)


def _pin_row_major(x):
    """Optional layout constraint (HP_LAYOUT_PIN=1) pinning a value to the
    row-major layout Pallas custom calls use.  Round-4's copy census
    (tpu_jobs/127) measured 37 layout-assignment conversions at the
    custom-call boundaries of the full-routed forward and concluded "JAX
    exposes no per-op layout control" — jax 0.9 does
    (`jax.experimental.layout.with_layout_constraint`); this probes whether
    XLA's conv/pool emitters can produce row-major directly (conversion
    disappears) or just relocate the copy (no-op).  Off by default."""
    import os

    if os.environ.get("HP_LAYOUT_PIN", "0") != "1":
        return x
    from jax.experimental.layout import Layout, with_layout_constraint

    return with_layout_constraint(x, Layout(tuple(range(x.ndim))))


class FastConv(nn.Module):
    """nn.Conv-compatible 3D conv (torch k//2 padding, no bias) routed
    through the MXU-friendly reformulations of `ops/conv3d_fast.py`.

    XLA's 3D conv *backward* lowering is the train-step bottleneck on this
    toolchain (dx+dk of a 1x1x1 c256->64 @64^3: 11.8 ms for two matmuls'
    worth of work — tpu_diag_conv.py); expressing the pointwise convs as
    dot_generals more than halves both passes.  Param tree identical to
    nn.Conv ({'kernel'} of shape (k, k, k, C_in, C_out))."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dtype: Dtype = jnp.float32
    prefer_mm: bool = False

    @nn.compact
    def __call__(self, x, scale=None, shift=None, relu: bool = False):
        """Optional fused epilogue (``y*scale + shift`` per-C_out, then
        ReLU): executed in-kernel on the Pallas MXU path, as a trailing
        (XLA-fused) elementwise pass otherwise.  Callers pass the
        inference BatchNorm affine here so the kernel boundary does not
        cost an extra HBM round-trip of the conv output."""
        from hiddenpose_tpu.ops.conv3d_fast import (
            conv1x1x1_mm,
            conv3x3x3_d2d,
            conv3x3x3_taps_mm,
            fast_modes,
        )
        from hiddenpose_tpu.ops.conv_acc import conv_acc32
        from hiddenpose_tpu.ops.pallas.conv3mxu import conv3mxu_route

        route = conv3mxu_route()
        k = self.kernel_size
        kernel = self.param(
            "kernel", kaiming_out_normal,
            (k, k, k, x.shape[-1], self.features),
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        # Probe knob (HP_LAYOUT_PIN=1, full/island routes only): pin every
        # FastConv boundary value row-major so XLA's own convs between
        # Pallas islands emit the custom-call layout directly instead of
        # paying a conversion copy per boundary — see _pin_row_major.
        pin = _pin_row_major if route in ("full", "island") else (lambda v: v)
        x = pin(x)

        def epilogue(y):
            if scale is not None:
                y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
            if relu:
                y = nn.relu(y)
            return y

        if k == 3 and self.stride == 1:
            # MXU tap-pack kernel for the mid-channel Bottleneck conv2
            # shapes (c64-c256) — XLA's 3D conv emitter runs them at
            # 10-15 TF/s; the kernel measured 1.4-1.8x faster standalone
            # and its custom VJP routes dx through the same kernel
            # (`ops/pallas/conv3mxu.py`).
            from hiddenpose_tpu.ops.pallas.conv3mxu import (
                conv3_mxu,
                conv3_mxu_bwd_diff,
                conv3_mxu_diff,
                conv3mxu_supported,
            )

            if route and conv3mxu_supported(
                x.shape, x.shape[-1], self.features
            ):
                if route in ("full", "island"):
                    if scale is not None or relu:
                        # Fused-epilogue form is inference-only (no VJP).
                        return pin(conv3_mxu(x, kernel, scale, shift,
                                             relu=relu))
                    return pin(conv3_mxu_diff(x, kernel))
                if scale is None and not relu:
                    # 'bwd': native forward, Pallas dx (the composed-model
                    # optimum — tpu_jobs/116-118).  A fused-epilogue
                    # request falls through to the base path + XLA-fused
                    # epilogue, which is the same program.
                    return conv3_mxu_bwd_diff(x, kernel)
        if k == 3 and route == "island":
            # 'island' keeps the forward free of XLA convolution ops: the
            # stage-transition stride-2 convs (and any 3^3 the MXU kernel
            # doesn't admit) lower as tap matmuls at default layout instead
            # of XLA convs whose channel-major layout choice charges
            # boundary copies (round-4 census, tpu_jobs/127).
            return pin(epilogue(conv3x3x3_taps_mm(x, kernel, self.stride)))
        modes = fast_modes()
        if k == 1 and (self.prefer_mm or route == "island" or "mm" in modes):
            # dot_general wants the DEFAULT layout, same as a Pallas
            # custom call.  When the block's 3^3 conv runs in the MXU
            # kernel, leaving the 1x1s as XLA convolutions makes layout
            # assignment pick channel-major for them and insert a
            # full-activation copy at EVERY kernel boundary (+14 copies /
            # +15 ms on the b2 128^3 forward, tpu_jobs/109-110) — so the
            # block owner sets prefer_mm whenever it routes its conv2.
            return pin(epilogue(conv1x1x1_mm(x, kernel, self.stride)))
        if k == 3 and "d2d" in modes:
            return pin(epilogue(conv3x3x3_d2d(x, kernel, self.stride)))
        return pin(epilogue(conv_acc32(
            x, kernel, (self.stride,) * 3, ((k // 2, k // 2),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(self.dtype)))


class FastDeconv(nn.Module):
    """nn.ConvTranspose(k4, s2, SAME, no bias)-compatible module routed
    through the 8-phase matmul formulation (`conv_transpose4_s2_mm`,
    bit-exact vs flax)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from hiddenpose_tpu.ops.conv3d_fast import (
            conv_transpose4_s2_mm,
            deconv4_s2_diff,
            fast_modes,
        )
        from hiddenpose_tpu.ops.pallas.conv3mxu import conv3mxu_route

        kernel = self.param(
            "kernel", deconv_init, (4, 4, 4, x.shape[-1], self.features)
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if "deconv" in fast_modes() or conv3mxu_route() == "island":
            # 'island': the 8-phase matmul form (bit-exact vs flax) keeps
            # the head free of XLA transposed convs — see FastConv.
            return conv_transpose4_s2_mm(x, kernel)
        # Native forward; custom backward (phase-matmul dk, strided-conv
        # dx) — see ops/conv3d_fast.py::deconv4_s2_diff.
        return deconv4_s2_diff(x, kernel)


class BNAffine(nn.Module):
    """Inference BatchNorm as a per-channel (scale, shift) pair, with a
    param/batch_stats tree identical to ``nn.BatchNorm`` (params
    ``scale``/``bias``; batch_stats ``mean``/``var``) so checkpoints and
    the torch importer see the same structure.  Returns the affine instead
    of applying it, letting the caller fuse the normalization into the
    kernel that PRODUCES the activation (FastConv epilogue) instead of
    paying an extra HBM round-trip after a Pallas call boundary."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        s = gamma * jax.lax.rsqrt(var.value + self.epsilon)
        return s, beta - mean.value * s


def _conv2_route(shape, planes: int, stride: int) -> str:
    """Static routing for this block's conv2: '' | 'bwd' | 'full' |
    'island' (see ops/pallas/conv3mxu.py::conv3mxu_route)."""
    from hiddenpose_tpu.ops.pallas.conv3mxu import (
        conv3mxu_route,
        conv3mxu_supported,
    )

    if stride != 1 or not conv3mxu_supported(
        (*shape[:-1], planes), planes, planes
    ):
        return ""
    return conv3mxu_route()


def _conv2_routed(shape, planes: int, stride: int) -> bool:
    """Should the sibling 1x1 convs lower as dot_generals (prefer_mm)?
    Only when the Pallas kernel runs in the FORWARD program ('full' /
    'island'): there, a channel-major XLA conv neighbouring the
    custom-call boundary costs a full-activation copy per boundary
    (+14 copies / +15 ms, tpu_jobs/109-110).  Under 'bwd' routing the
    forward program is all-XLA (mm 1x1s would only hurt it —
    tpu_diag_conv2) and the grad program keeps XLA's fused conv backward
    around the dx custom calls."""
    return _conv2_route(shape, planes, stride) in ("full", "island")


def _conv2_fusible(shape, planes: int, train: bool, stride: int) -> bool:
    """Fuse the bn2 affine into the conv2 kernel epilogue (inference only —
    training BN needs batch statistics of the raw conv output, and the
    Pallas fused form has no VJP)."""
    return not train and _conv2_route(shape, planes, stride) in (
        "full", "island",
    )


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4
    train: bool = False

    @nn.compact
    def __call__(self, x):
        train = self.train
        # Explicit torch-convention padding (k//2 per side): at stride 2,
        # XLA "SAME" pads (0, 1) and samples positions 0,2,4,... while the
        # reference's Conv3d(k3, s2, p1) samples -1,1,3,...
        # (`posenet3d_50.py:13-23`) — a one-voxel shift that breaks
        # checkpoint-import parity (tests/test_torch_import.py).
        routed = _conv2_routed(x.shape, self.planes, self.stride)
        conv = lambda f, k, s, name: FastConv(
            f, kernel_size=k, stride=s, dtype=self.dtype, name=name,
            prefer_mm=routed,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name,
        )

        residual = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        if _conv2_fusible(x.shape, self.planes, train, self.stride):
            s2, t2 = BNAffine(self.planes, name="bn2")()
            out = conv(self.planes, 3, 1, "conv2")(
                out, scale=s2, shift=t2, relu=True
            )
        else:
            out = nn.relu(
                bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out))
            )
        out = bn("bn3")(conv(self.planes * self.expansion, 1, 1, "conv3")(out))

        if self.use_projection:
            residual = bn("bn_proj")(
                conv(self.planes * self.expansion, 1, self.stride, "conv_proj")(x)
            )
        return nn.relu(out + residual)


class BasicBlock(nn.Module):
    """ResNet-18/34 variant block (`posenet3d_50.py:26-56`)."""

    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 1
    train: bool = False

    @nn.compact
    def __call__(self, x):
        train = self.train
        # torch-convention padding — see Bottleneck.
        s = self.stride
        # torch k3 s2 p1 conv output extent is ceil(v/s) = (v-1)//s + 1
        # (matters for odd extents; v//s under-predicts and could desync
        # the routing heuristic from the real conv2 input shape).
        shape2 = (x.shape[0], *((v - 1) // s + 1 for v in x.shape[1:4]),
                  self.planes)
        routed = _conv2_routed(shape2, self.planes, 1)
        conv = lambda f, k, s, name: FastConv(
            f, kernel_size=k, stride=s, dtype=self.dtype, name=name,
            prefer_mm=routed,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name,
        )
        residual = x
        out = nn.relu(bn("bn1")(conv(self.planes, 3, self.stride, "conv1")(x)))
        if _conv2_fusible(out.shape, self.planes, train, 1):
            s2, t2 = BNAffine(self.planes, name="bn2")()
            out = conv(self.planes, 3, 1, "conv2")(out, scale=s2, shift=t2)
        else:
            out = bn("bn2")(conv(self.planes, 3, 1, "conv2")(out))
        if self.use_projection:
            residual = bn("bn_proj")(
                conv(self.planes, 1, self.stride, "conv_proj")(x)
            )
        return nn.relu(out + residual)


class FinalConv(nn.Module):
    """The head's 1x1x1 conv to ``num_joints`` channels, with bias — param
    tree identical to ``nn.Conv`` ({'kernel': (1,1,1,C_in,C_out), 'bias'})
    so checkpoints and the torch importer are unchanged.  Base path is the
    same lax conv nn.Conv lowers to; 'island' routing applies it as a
    dot_general (see FastConv)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from hiddenpose_tpu.ops.conv3d_fast import conv1x1x1_mm
        from hiddenpose_tpu.ops.pallas.conv3mxu import conv3mxu_route

        kernel = self.param(
            "kernel", kaiming_out_normal, (1, 1, 1, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if conv3mxu_route() == "island":
            return conv1x1x1_mm(x, kernel) + bias.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + bias.astype(y.dtype)


class DeconvHead(nn.Module):
    """3 x (ConvTranspose k4 s2 + BN + ReLU) then 1x1x1 conv to joints.

    Reference: `posenet3d_50.py:98-153` with (2048, 3, 256, 4, 1, 24).
    """

    num_layers: int = 3
    num_filters: int = 256
    num_joints: int = 24
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = FastDeconv(
                self.num_filters, dtype=self.dtype, name=f"deconv{i + 1}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i + 1}",
            )(x)
            x = nn.relu(x)
        return FinalConv(self.num_joints, dtype=self.dtype, name="final")(x)


class StemS2D(nn.Module):
    """Fused stem: conv7^3 (C_in→features) + BN + ReLU + MaxPool(3, s2, p1),
    evaluated entirely in 2x2x2 space-to-depth space.

    Under XLA's native lowering the 1-channel 7^3 conv at 128^3 is the
    hottest op of the whole pipeline (~63 ms, ~3 TFLOP/s: MXU contraction
    dim is C_in=1).  The s2d form convolves at half resolution with
    contraction 5^3*8 and never materialises the 128^3 x 64ch activation:
    BN/ReLU run on the s2d tensor (statistics per real channel) and the
    maxpool reduces the output phases directly
    (`ops/space_to_depth.py::phase_maxpool_k3s2`).  Measured: stem 47 ms →
    ~18 ms.  Param tree: {'kernel'} (+ BN under 'bn').
    """

    features: int = 64
    train: bool = False
    dtype: Dtype = jnp.float32
    # Fused Pallas inference kernel (ops/pallas/stem_conv.py): bit-exact vs
    # the XLA path (max err 0.0 on-chip).  None = auto (on for TPU
    # inference — round 2 measurement has it winning in-situ as well once
    # the rest of the pipeline stopped being layout-bound).
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, C_in) → (B, D/2, H/2, W/2, F)
        from hiddenpose_tpu.ops.pallas.conv3p import (
            on_tpu_default_device,
            pallas_enabled,
        )
        from hiddenpose_tpu.ops.space_to_depth import (
            make_s2d_kernel,
            phase_maxpool_k3s2,
            space_to_depth_3d,
        )

        f = self.features
        kernel = self.param(
            "kernel", kaiming_out_normal, (7, 7, 7, x.shape[-1], f)
        )
        k2 = make_s2d_kernel(kernel.astype(self.dtype))

        use_pallas = (
            pallas_enabled()
            if self.use_pallas is None else self.use_pallas
        )
        kernel_shapes_ok = (
            use_pallas
            and pallas_enabled()
            and x.shape[-1] == 1
            and (x.shape[1] // 2) % 4 == 0
            and (x.shape[2] // 2) % 4 == 0
            # Mosaic on this toolchain rejects the kernel's lane slices
            # below half-tile width (observed: "Slice shape along dimension
            # 4 must be aligned to tiling (128), but is 64" at 64^3 input);
            # the kernel targets the production 128-wide volumes.
            and x.shape[3] // 2 == 64
        )
        pallas_ok = not self.train and kernel_shapes_ok
        # Measured negative result (tpu_jobs/029): routing the TRAIN
        # forward through the Pallas kernel too (conv_stem_raw_diff,
        # affine disabled) REGRESSED the step 423 -> 496 ms — XLA fuses
        # the conv with the BN-statistic sums and its consumers' layouts,
        # which the kernel boundary breaks.  The kernel stays
        # inference-only; training keeps the XLA conv + matmul-VJP.
        y2 = None
        if not pallas_ok:
            # Custom-VJP conv: the native weight-gradient of this C_in=8
            # conv was the single hottest op of the training step (47.7 ms
            # — see ops/space_to_depth.py::conv_s2d_stem_diff).
            from hiddenpose_tpu.ops.space_to_depth import conv_s2d_stem_diff

            x2 = space_to_depth_3d(x.astype(self.dtype))
            y2 = conv_s2d_stem_diff(x2, k2)

        # BatchNorm with phase-tied parameters, applied directly on the
        # (.., 8*f) tensor — splitting the lane axis for flax BatchNorm
        # costs two full relayouts of the 8x-resolution activation.
        # Statistics are per REAL channel (identical elements to a native
        # BN over the full-resolution conv output).
        gamma = self.param("bn_scale", nn.initializers.ones, (f,))
        beta = self.param("bn_bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable(
            "batch_stats", "bn_mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "bn_var", lambda: jnp.ones((f,), jnp.float32)
        )
        eps = 1e-5
        if self.train:
            flat = y2.reshape(-1, 8, f)
            mean = flat.mean(axis=(0, 1))
            var = flat.var(axis=(0, 1))
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        else:
            mean, var = ra_mean.value, ra_var.value
        scale = gamma * jax.lax.rsqrt(var + eps)
        shift = beta - mean * scale

        if pallas_ok:
            # Fused Pallas kernel (conv + BN affine + ReLU in one VMEM
            # pass) straight from the raw volume — one layout transform
            # total, same as the XLA path.  Inference only: training keeps
            # the XLA path for batch statistics and autodiff.
            from hiddenpose_tpu.ops.pallas.stem_conv import (
                stem_conv_raw_pallas,
            )

            y2 = stem_conv_raw_pallas(
                x.astype(self.dtype), k2, jnp.tile(scale, 8),
                jnp.tile(shift, 8), relu=True,
            ).astype(self.dtype)
            return self._pool(y2)

        y2 = y2 * jnp.tile(scale, 8) + jnp.tile(shift, 8)
        y2 = nn.relu(y2).astype(self.dtype)
        return self._pool(y2)

    def _pool(self, y2):
        """Phase max-pool: the Pallas kernel pair (fwd + exact-VJP bwd,
        `ops/pallas/phase_pool.py`) when on TPU and tile-shaped — the XLA
        slice-chain's backward materialises every stage in HBM (measured
        64 ms at the production stem shape vs ~12 ms kernelled) — else the
        XLA chain."""
        from hiddenpose_tpu.ops.pallas.conv3p import pallas_enabled
        from hiddenpose_tpu.ops.pallas.phase_pool import phase_maxpool_diff
        from hiddenpose_tpu.ops.space_to_depth import phase_maxpool_k3s2

        if (pallas_enabled() and y2.shape[-1] % 128 == 0
                and y2.shape[3] % 8 == 0 and y2.shape[1] >= 2):
            return phase_maxpool_diff(y2)
        return phase_maxpool_k3s2(y2)


class PoseNet3D(nn.Module):
    """generate_model(50) + DeconvHead (`posenet3d_50.py:156-318`)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    inplanes: Sequence[int] = (64, 128, 256, 512)
    block: str = "bottleneck"  # 'bottleneck' (depth>=50) | 'basic'
    widen_factor: float = 1.0
    conv1_t_size: int = 7
    conv1_t_stride: int = 1
    no_max_pool: bool = False
    num_joints: int = 24
    dtype: Dtype = jnp.float32
    # Rematerialise residual blocks in the backward pass: at the reference
    # resolution (128^3) the stored activations of 16 blocks exceed v5e HBM;
    # remat trades ~30% backward flops for fitting batch>=2 on one chip.
    remat: bool = True
    # Rematerialise the stem too: its saved activations (s2d conv output +
    # post-BN/ReLU phase tensor, ~2.2 GB at 128^3 b2) are the largest and
    # LONGEST-lived buffers of the backward; recomputing the 32 ms stem
    # forward relieves HBM pressure across the whole stack backward.
    remat_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, D, H, W, C)
        widths = [int(w * self.widen_factor) for w in self.inplanes]
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.remat:
            # `train` is a module attribute (static by construction), so the
            # remat-wrapped call has only the activation as a traced arg.
            block_cls = nn.remat(block_cls)
        expansion = 4 if self.block == "bottleneck" else 1

        s2d_stem = (
            self.conv1_t_size == 7
            and self.conv1_t_stride == 1
            and not self.no_max_pool
            and x.shape[-1] <= 2
            and all(d % 2 == 0 for d in x.shape[1:4])
        )
        if s2d_stem:
            stem_cls = nn.remat(StemS2D) if self.remat_stem else StemS2D
            x = stem_cls(
                features=widths[0], train=train, dtype=self.dtype,
                name="conv1",
            )(x)
        else:
            x = nn.Conv(
                widths[0],
                (self.conv1_t_size, 7, 7),
                strides=(self.conv1_t_stride, 1, 1),
                padding="SAME",
                use_bias=False,
                kernel_init=kaiming_out_normal,
                dtype=self.dtype,
                name="conv1",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="bn1",
            )(x)
            x = nn.relu(x)
            if not self.no_max_pool:
                x = max_pool3d(x, 3, 2, pad=1)

        in_planes = widths[0]
        for stage, (planes, blocks) in enumerate(zip(widths, self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                proj = b == 0 and (s != 1 or in_planes != planes * expansion)
                x = block_cls(
                    planes=planes, stride=s, use_projection=proj,
                    dtype=self.dtype, train=train,
                    name=f"layer{stage + 1}_{b}",
                )(x)
                in_planes = planes * expansion

        return DeconvHead(
            num_joints=self.num_joints, dtype=self.dtype, name="head"
        )(x, train=train)


def get_pose_net_50(num_joints: int = 24, dtype=jnp.float32) -> PoseNet3D:
    """Matches `get_pose_net_50()` (`posenet3d_50.py:294-318`)."""
    return PoseNet3D(num_joints=num_joints, dtype=dtype)
