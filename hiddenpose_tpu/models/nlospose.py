"""NlosPose — the flagship composite model.

Re-design of `/root/reference/models/NlosPose.py:13-59`:

    meas (B, 1, T, H, W)
      → FeatureExtraction (learned + corner-mask dual branch)
      → LCT reconstruction (physics layer, `ops/lct.py`)
      → normalize_feature (min/max ×10)
      → UNet3d residual autoencoder
      → PoseNet3D (3D ResNet-50 + deconv head) on (feature + refinement)
      → (heatmaps (B, J, Z, Y, X), refine_feature (B, 1, T, H, W))

TPU design notes:
* Everything between the two boundary transposes runs channels-last (NDHWC);
  the external API keeps the reference's NCDHW so losses/tests line up.
* The LCT constants ride along as an :class:`LCTParams` pytree argument, so
  the whole forward is one jittable pure function with no host round-trips
  between stages (the reference crosses module/device boundaries per stage,
  `models/NlosPose.py:49-59`).
* `posenet2d` backbone variant (VisibleNet + 2D ResNet,
  `models/NlosPose.py:41-45`) lives in `models/posenet2d.py`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hiddenpose_tpu.config import ModelConfig
from hiddenpose_tpu.models.blocks import FeatureExtraction
from hiddenpose_tpu.models.posenet3d import PoseNet3D
from hiddenpose_tpu.models.unet3d import UNet3d
from hiddenpose_tpu.ops.lct import LCTParams, lct_apply, make_lct_params
from hiddenpose_tpu.ops.normalize import normalize_feature_last


class NlosPose(nn.Module):
    """cfg is the static ModelConfig (frozen dataclass → hashable).

    ``spatial_mesh``: optional `jax.sharding.Mesh` (hashable → a static
    attribute).  When set, the LCT's padded FFT cube is spatially sharded
    over the mesh's 'model' axis (`ops/lct.py::lct_apply_sharded`) — the
    SURVEY §2.6 TP/SP decomposition for configs whose padded spectrum
    exceeds one chip's HBM (256^3 batch>2)."""

    cfg: ModelConfig
    spatial_mesh: Any = None

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        # Stage-level rematerialisation (cfg.stage_remat): checkpointing
        # each stage boundary was required through round 3; the round-4 HBM
        # ledger (tpu_jobs/122: b2 step temp 2.52 GiB of 16) shows 128^3
        # training no longer needs the memory, but the A/B (tpu_jobs/125)
        # measured remat-OFF slightly SLOWER (XLA already remats across
        # these boundaries), so True stays the default everywhere.
        # static_argnums: `train` selects the Pallas-vs-XLA conv path with
        # Python control flow, so it must stay concrete under remat.
        fe_cls = (nn.remat(FeatureExtraction, static_argnums=(2,))
                  if c.stage_remat else FeatureExtraction)
        un_cls = (nn.remat(UNet3d, static_argnums=(2,))
                  if c.stage_remat else UNet3d)
        self.feature_extraction = fe_cls(
            basedim=c.basedim, stride=1, dtype=dtype
        )
        self.autoencoder = un_cls(
            in_channels=c.in_channels, n_channels=4, dtype=dtype
        )
        if c.backbone == "posenet3d_50":
            self.pose_net = PoseNet3D(
                num_joints=c.num_joints, dtype=dtype,
                remat=c.posenet_remat,
                remat_stem=c.posenet_remat_stem,
            )
        elif c.backbone == "posenet2d":
            # Reference constructs VisibleNet + 2D ResNet for this mode
            # (models/NlosPose.py:41-45) but its forward never invokes
            # vis_net — the 2D path is dead code there.  Here it is wired
            # coherently: VisibleNet depth-flattens the volume, the 2D net
            # emits J*depth depth-sliced heatmap channels.
            from hiddenpose_tpu.models.posenet2d import ResPoseNet2D

            self.pose_net = ResPoseNet2D(
                num_joints=c.num_joints,
                depth_dim=c.heatmap_size[0],
                dtype=dtype,
            )
        else:
            raise NotImplementedError(f"backbone {c.backbone!r}")

    def __call__(
        self,
        meas: jax.Array,
        lct: LCTParams,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """meas: (B, C, T, H, W) → (heatmaps (B, J, Z, Y, X), refine (B, C, T, H, W))."""
        c = self.cfg
        b = meas.shape[0]

        # NCDHW → NDHWC once at the boundary.
        x = jnp.transpose(meas, (0, 2, 3, 4, 1))

        x = self.feature_extraction(x, train)  # (B, T, H, W, basedim)

        # Physics layer: fold channels into batch for the LCT
        # (time window (0, T) as in models/NlosPose.py:17-18,53).
        ch = x.shape[-1]
        flat = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(
            b * ch, *x.shape[1:4]
        )
        # Recompute the FFT chain in the backward pass instead of storing
        # the 2x-padded complex spectra (~0.5 GB per sample at 128^3) —
        # also gated on cfg.stage_remat (see setup()).
        ckpt = jax.checkpoint if c.stage_remat else (lambda f: f)
        if self.spatial_mesh is not None:
            from hiddenpose_tpu.ops.lct import lct_apply_sharded

            mesh = self.spatial_mesh
            vol = ckpt(
                lambda m, p: lct_apply_sharded(m, p, mesh)
            )(flat, lct)
        else:
            vol = ckpt(
                lambda m, p: lct_apply(m, p, batch_chunk=c.lct_batch_chunk)
            )(flat, lct)
        vol = vol.reshape(b, ch, *vol.shape[1:]).transpose(0, 2, 3, 4, 1)

        feature = normalize_feature_last(vol)  # (B, T, H, W, ch)
        refine = self.autoencoder(feature, train)

        if c.backbone == "posenet2d":
            from hiddenpose_tpu.models.posenet2d import visible_net

            volume = jnp.transpose(feature + refine, (0, 4, 1, 2, 3))
            flat2d = visible_net(volume)              # (B, 2*C*k, H, W)
            flat2d = jnp.transpose(flat2d, (0, 2, 3, 1))  # NHWC
            hm2d = self.pose_net(flat2d, train=train)  # (B, h, w, J*depth)
            bh, hh, ww, _ = hm2d.shape
            heatmaps = jnp.transpose(hm2d, (0, 3, 1, 2)).reshape(
                bh, c.num_joints, c.heatmap_size[0], hh, ww
            )
        else:
            heatmaps = self.pose_net(feature + refine, train=train)
            # NDHWC → reference conventions at the boundary.
            heatmaps = jnp.transpose(heatmaps, (0, 4, 1, 2, 3))  # (B,J,Z,Y,X)

        refine = jnp.transpose(refine, (0, 4, 1, 2, 3))  # (B, C, T, H, W)
        return heatmaps, refine


def build_nlospose(
    cfg: ModelConfig, spatial_mesh=None
) -> Tuple[NlosPose, LCTParams]:
    """Construct the model plus its physics constants.

    Mirrors the wiring of `models/NlosPose.py:20-32`: LCT configured with
    (time_size, image_size[0], wall_size, bin_len)."""
    model = NlosPose(cfg, spatial_mesh=spatial_mesh)
    lct = make_lct_params(
        image_size=cfg.image_size[0],
        time_size=cfg.time_size,
        bin_len=cfg.bin_len,
        wall_size=cfg.wall_size,
        mode=cfg.mode,
        material=cfg.material,
    )
    return model, lct
