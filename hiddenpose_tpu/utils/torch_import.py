"""PyTorch-reference checkpoint → flax parameter-tree converter.

The reference releases checkpoints as
``{model_state_dict, optimizer_state_dict, lr_scheduler, epoch}``
(`/root/reference/test.py:133-136`, saved at `train.py:210-220`) where
``model_state_dict`` is the flat ``NlosPose`` module tree
(`models/NlosPose.py:13-59`).  This module maps that layout onto the
``hiddenpose_tpu`` ``{params, batch_stats}`` trees so the released weights
can be evaluated here directly — MPJPE parity (BASELINE.md north star) is
one `scripts/import_torch_checkpoint.py` invocation once the weights mount.

Pure numpy: torch is only needed by the CLI wrapper that unpickles the
``.pth`` file.

Layout conversions (verified numerically against torch modules in
``tests/test_torch_import.py``):

* ``Conv3d.weight`` is OIDHW; flax ``nn.Conv`` kernels are DHWIO
  → ``transpose(2, 3, 4, 1, 0)``.
* ``ConvTranspose3d.weight`` is (C_in, C_out, D, H, W) and torch's
  transposed conv *convolves* (sums over ``n = s·m − p + k``); flax
  ``nn.ConvTranspose`` *correlates* the stored kernel with the
  lhs-dilated input → spatial flip + ``transpose(2, 3, 4, 0, 1)``.
* BatchNorm ``weight/bias`` → ``scale/bias`` params;
  ``running_mean/running_var`` → ``batch_stats`` ``mean/var``
  (``num_batches_tracked`` is dropped).  The posenet stem's BN folds into
  ``StemS2D``'s ``bn_scale/bn_bias`` params and ``bn_mean/bn_var`` stats.
* GroupNorm ``weight/bias`` → ``scale/bias``.
* ``feature_extraction.weights`` (the corner-mask ``nn.Parameter``,
  `models/feature_extraction.py:139-145`) → ``corner_kernel`` DHWIO.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

# Reference ResNet-50 depth layout (`posenet3d_50.py:308-318`).
_RESNET50_LAYERS = (3, 4, 6, 3)
_DECONV_LAYERS = 3


def _np(t) -> np.ndarray:
    a = np.asarray(t)
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    return a


def _conv_w(t) -> np.ndarray:
    """OIDHW → DHWIO."""
    return np.transpose(_np(t), (2, 3, 4, 1, 0))


def _deconv_w(t) -> np.ndarray:
    """(C_in, C_out, D, H, W) convolving → DHW-I-O correlating."""
    return np.transpose(_np(t)[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


class _Taker:
    """Tracks which state-dict keys were consumed."""

    def __init__(self, sd: Mapping):
        self.sd = dict(sd)
        self.consumed = set()

    def __call__(self, key: str) -> np.ndarray:
        self.consumed.add(key)
        return _np(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd

    def leftovers(self):
        return sorted(
            k for k in self.sd
            if k not in self.consumed and not k.endswith("num_batches_tracked")
        )


def _conv(take, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": _conv_w(take(f"{prefix}.weight"))}
    if bias:
        out["bias"] = take(f"{prefix}.bias")
    return out


def _norm_affine(take, prefix: str) -> Dict:
    return {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}


def _bn_stats(take, prefix: str) -> Dict:
    return {
        "mean": take(f"{prefix}.running_mean"),
        "var": take(f"{prefix}.running_var"),
    }


def convert_feature_extraction(take: _Taker) -> Dict:
    """`models/feature_extraction.py:122-171` → `models.blocks.FeatureExtraction`.

    torch tree: conv1 = Sequential(Pad, Conv3d, ResConv3D, ResConv3D) so the
    convs live at conv1.1 / conv1.{2,3}.tmp.{1,4}; the corner-mask parameter
    is `weights`."""
    p = "feature_extraction"
    return {
        "conv_in": _conv(take, f"{p}.conv1.1"),
        "res1": {
            "conv1": _conv(take, f"{p}.conv1.2.tmp.1"),
            "conv2": _conv(take, f"{p}.conv1.2.tmp.4"),
        },
        "res2": {
            "conv1": _conv(take, f"{p}.conv1.3.tmp.1"),
            "conv2": _conv(take, f"{p}.conv1.3.tmp.4"),
        },
        "corner_kernel": _conv_w(take(f"{p}.weights")),
    }


def _double_conv(take, prefix: str) -> Dict:
    """`unet/unet3d.py:11-28`: Sequential(conv, GN, ReLU, conv, GN, ReLU)."""
    return {
        "conv1": _conv(take, f"{prefix}.0"),
        "gn1": _norm_affine(take, f"{prefix}.1"),
        "conv2": _conv(take, f"{prefix}.3"),
        "gn2": _norm_affine(take, f"{prefix}.4"),
    }


def convert_unet(take: _Taker, prefix: str = "autoencoder") -> Dict:
    """`unet/unet3d.py:74-118` → `models.unet3d.UNet3d`."""
    out = {"conv": _double_conv(take, f"{prefix}.conv.double_conv")}
    for i in range(1, 5):
        out[f"enc{i}"] = _double_conv(
            take, f"{prefix}.enc{i}.encoder.1.double_conv"
        )
        out[f"dec{i}"] = _double_conv(
            take, f"{prefix}.dec{i}.conv.double_conv"
        )
    out["out"] = _conv(take, f"{prefix}.out.conv")
    return out


def convert_posenet(take: _Taker, prefix: str = "pose_net") -> Tuple[Dict, Dict]:
    """`posenet3d_50.py:156-318` → `models.posenet3d.PoseNet3D`.

    Returns (params, batch_stats)."""
    stem_bn = f"{prefix}.bn1"
    params: Dict = {
        "conv1": {
            # StemS2D keeps the RAW 7^3 kernel; the s2d transform is applied
            # at trace time (models/posenet3d.py::StemS2D).
            "kernel": _conv_w(take(f"{prefix}.conv1.weight")),
            "bn_scale": take(f"{stem_bn}.weight"),
            "bn_bias": take(f"{stem_bn}.bias"),
        }
    }
    stats: Dict = {
        "conv1": {
            "bn_mean": take(f"{stem_bn}.running_mean"),
            "bn_var": take(f"{stem_bn}.running_var"),
        }
    }

    for stage, blocks in enumerate(_RESNET50_LAYERS, start=1):
        for b in range(blocks):
            tp = f"{prefix}.layer{stage}.{b}"
            name = f"layer{stage}_{b}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for i in (1, 2, 3):
                blk_p[f"conv{i}"] = _conv(take, f"{tp}.conv{i}", bias=False)
                blk_p[f"bn{i}"] = _norm_affine(take, f"{tp}.bn{i}")
                blk_s[f"bn{i}"] = _bn_stats(take, f"{tp}.bn{i}")
            if take.has(f"{tp}.downsample.0.weight"):
                blk_p["conv_proj"] = _conv(
                    take, f"{tp}.downsample.0", bias=False
                )
                blk_p["bn_proj"] = _norm_affine(take, f"{tp}.downsample.1")
                blk_s["bn_proj"] = _bn_stats(take, f"{tp}.downsample.1")
            params[name] = blk_p
            stats[name] = blk_s

    # DeconvHead: features = [deconv, bn, relu] x 3 + final conv at index 9
    # (`posenet3d_50.py:98-153`).
    head_p: Dict = {}
    head_s: Dict = {}
    for i in range(_DECONV_LAYERS):
        head_p[f"deconv{i + 1}"] = {
            "kernel": _deconv_w(take(f"{prefix}.head.features.{3 * i}.weight"))
        }
        head_p[f"bn{i + 1}"] = _norm_affine(
            take, f"{prefix}.head.features.{3 * i + 1}"
        )
        head_s[f"bn{i + 1}"] = _bn_stats(
            take, f"{prefix}.head.features.{3 * i + 1}"
        )
    head_p["final"] = _conv(take, f"{prefix}.head.features.{3 * _DECONV_LAYERS}")
    params["head"] = head_p
    stats["head"] = head_s
    return params, stats


def convert_state_dict(sd: Mapping, strict: bool = True) -> Dict:
    """Full ``NlosPose`` state_dict → ``{"params": ..., "batch_stats": ...}``.

    The LCT physics layer owns no torch parameters or buffers (its constants
    are plain attributes set by ``todev``, `models/feature_propagation.py:
    173-184`), so the three NN submodules are the whole state.
    """
    take = _Taker(sd)
    pn_params, pn_stats = convert_posenet(take)
    tree = {
        "params": {
            "feature_extraction": convert_feature_extraction(take),
            "autoencoder": convert_unet(take),
            "pose_net": pn_params,
        },
        "batch_stats": {"pose_net": pn_stats},
    }
    left = take.leftovers()
    if strict and left:
        raise KeyError(
            f"{len(left)} reference keys were not consumed: {left[:8]}..."
        )
    return tree
