"""Typed, immutable configuration for the TPU-native HiddenPose framework.

Replaces the reference's mutable yacs singletons (`config/config_noise.py:4-112`)
with frozen dataclasses.  The reference mutates its config at runtime
(`train.py:77-86` ``updata_config_t128_128x128``); here the same values are
produced by :func:`Config.preset_t128` which returns a *new* config.

Every default mirrors `/root/reference/config/config_noise.py` so that a model
built from :func:`default_config` is architecturally identical to the
reference's live training configuration.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Mirrors `config/config_noise.py:16-53` (MODEL node)."""

    name: str = "nlospose"
    dnum: int = 1
    basedim: int = 1
    bin_len: float = 0.01
    wall_size: float = 2.0
    in_channels: int = 1
    out_channels: int = 1
    feature_channels: int = 2
    grid_dim: int = 256
    time_size: int = 512
    image_size: Tuple[int, int] = (256, 256)
    heatmap_size: Tuple[int, int, int] = (64, 64, 64)
    patch_size: int = 4
    downsample_ratio: int = 1
    mode: str = "lct"  # 'lct' | 'bp'
    material: str = "diffuse"  # 'diffuse' | 'specular'
    coord_representation: str = "3DHeatmap"
    num_joints: int = 24
    backbone: str = "posenet3d_50"  # or 'posenet2d'
    pretrain_autoencoder: bool = False
    pretrain_autoencoder_path: str = "./lib/nlos_unet.pth"

    # Transformer family (config/config_noise.py:41-53)
    patch_feature_dim: int = 256
    depth: int = 8
    heads: int = 8
    dim_head: int = 32
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    rotary_emb: bool = True
    out_dim: int = (64 * 2 + 128) * 2
    num_frames: int = 16

    # TPU-specific knobs (no reference equivalent)
    compute_dtype: str = "float32"  # activations dtype for conv stacks
    param_dtype: str = "float32"
    # LCT FFT batch chunking (0 = fully batched): bounds the live footprint
    # of the 2x-padded spectra so large batches stop thrashing HBM
    # (measured round 1: b8 inference REGRESSED to 11.2 vol/s vs 19.2 at b4).
    lct_batch_chunk: int = 0
    # Rematerialise the PoseNet stem in the backward pass (its saved
    # activations are ~2.2 GB at 128^3 b2, held across the whole stack
    # backward); see models/posenet3d.py::PoseNet3D.remat_stem.
    posenet_remat_stem: bool = False
    # Rematerialise the PoseNet residual blocks.  Required in round 1 to
    # fit 128^3 b2 on one v5e; with the round-3 backward work the no-remat
    # gradient both fits at the reference batch (b2) and is ~41 ms faster
    # (284.6 vs 325.7 ms posenet grad, tpu_diag_stemvjp.py), so off is the
    # default.  Measured at 128^3: b2 fits with remat off; b4 exceeds the
    # 16 GB HBM with remat on OR off (tpu_jobs/031) — single-chip training
    # at the reference resolution is batch-2-max either way, so the flag
    # only matters for smaller grids / future chips.
    posenet_remat: bool = False
    # Stage-level rematerialisation of FE / LCT / UNet in NlosPose.  The
    # round-4 HBM ledger (tpu_jobs/122: b2 train-step temp 2.52 GiB of 16)
    # shows the memory it buys is no longer needed at 128^3, but the A/B
    # (tpu_jobs/125) measured remat-OFF *slower* (383.8 vs 376.2 ms): XLA
    # already rematerialises across these boundaries and its no-remat
    # schedule is slightly worse.  Default stays ON (also the safe setting
    # for >=256^3 grids); the knob exists for A/B measurement only.
    stage_remat: bool = True


@dataclass(frozen=True)
class DatasetConfig:
    """Mirrors `config/config_noise.py:58-75` (DATASET node)."""

    name: str = "NlosPoseDataset"
    num_joints: int = 24
    target_type: str = "gaussian"
    heatmap_size: Tuple[int, int, int] = (64, 64, 64)
    vol_size: Tuple[int, int, int] = (256, 256, 256)
    downsample_cnt: int = 1
    sigma: float = 2.0
    use_different_joints_weight: bool = True
    phase: str = "train"
    train_path: str = "/data2/nlospose/pose_v2_noise"
    valid_path: str = "/data2/nlospose/pose_v2_noise"
    test_path: str = "/data2/nlospose/pose_v2_noise"
    simdr_split_ratio: int = 2
    # Noise model of the _noise dataloader variant
    # (utils/nlos_pose_dataloader_noise.py:167-172)
    noise: bool = False
    noise_gaussian_sigma: float = 10.61


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors `config/config_noise.py:84-91` (TRAIN node)."""

    optimizer: str = "adam"
    lr: float = 1e-3
    lr_factor: float = 0.2
    lr_step: Tuple[int, ...] = (2, 4, 13)
    batch_size: int = 2
    begin_epoch: int = 0
    end_epoch: int = 15
    seed: int = 410  # train.py:98
    # Reference quirk preserved: lr_scheduler.step() runs BEFORE the first
    # epoch (train.py:193), so epoch e trains with the schedule already
    # advanced to e+1.  See train/optim.py.
    step_before_epoch: bool = True
    loss_type: str = "L2JointLocationLoss"
    label_smoothing: float = 0.2
    # MXU pass count for every matmul/conv in the train step ('default' |
    # 'high' | 'highest').  'default' = one bf16 pass per f32 matmul;
    # round-5 measured it costing real model quality on this recipe while
    # 'highest' is ~3.5x step time (tpu_jobs/129cb, 135a, BENCH_NOTES
    # "Precision IS the learning-gap driver").  Kept at 'default' for
    # throughput parity with the recorded benchmarks; flip to 'high'/
    # 'highest' for quality-critical runs.
    matmul_precision: str = "default"


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    log_dir: str = "./log"
    result_dir: str = "./result"
    final_output_dir: str = "./checkpoints"
    phase: str = "train"
    test_batch_size: int = 2
    valid_batch_size: int = 1
    num_workers: int = 8

    def with_bf16(self) -> "Config":
        """Mixed precision: conv/matmul compute in bfloat16 (MXU-native),
        params + normalisation statistics + LCT physics + soft-argmax in
        float32.  No reference equivalent (reference is fp32-only)."""
        return replace(self, model=replace(self.model, compute_dtype="bfloat16"))

    def preset_t128(self) -> "Config":
        """The live training configuration (`train.py:77-86`).

        bin_len x4 = 0.04, T=128, HW=128x128, grid=128.
        """
        model = replace(
            self.model,
            bin_len=self.model.bin_len * 4,
            time_size=128,
            image_size=(128, 128),
            grid_dim=128,
        )
        return replace(self, model=model)

    def tiny(self, size: int = 16) -> "Config":
        """A miniature config for CI / multi-chip dry runs (no reference
        equivalent).  Keeps every architectural ratio of preset_t128 but at
        ``size``^3 grids, so tests run in seconds on CPU."""
        model = replace(
            self.model,
            bin_len=self.model.bin_len * (self.model.time_size // size),
            time_size=size,
            image_size=(size, size),
            grid_dim=size,
            heatmap_size=(size // 2, size // 2, size // 2),
        )
        dataset = replace(
            self.dataset,
            heatmap_size=(size // 2, size // 2, size // 2),
            vol_size=(size * 2, size * 2, size * 2),
        )
        return replace(self, model=model, dataset=dataset)


def default_config() -> Config:
    """Reference defaults (`config/config_noise.py`), pre-mutation."""
    return Config()


def t128_config() -> Config:
    """The configuration the reference actually trains with
    (`train.py:100-102`): defaults + updata_config_t128_128x128."""
    return default_config().preset_t128()


def asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)
