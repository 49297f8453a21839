"""DeepVoxels — the legacy NLOS feature-embedding composite.

Re-design of `/root/reference/models/feature.py:47-139` (the one ⚪ legacy
capability whose *composition* was missing in round 1): the render/occlusion
sub-nets are commented out in the reference (`feature.py:104-110`), so the
live computation is exactly

    input (B, C, T, H, W)
      → per-(b,c) min/max normalize           (`feature.py:18-30`)
      → Transient2volumn stride-2 dual-branch  (`customer_layers_3.py:18-58`)
      → LCT at half spatial res, 2x bin_len    (`feature.py:97-100,126`)
      → crop z to z*100//128                   (`feature.py:128-132`)
      → ReLU → normalize → x1e5                (`feature.py:134-137`)

The (disabled) training-noise injection of `feature.py:113-116` is provided
as :func:`deepvoxels_noise` for completeness but, as in the reference, is
not applied in the forward pass.

TPU notes: channels-last internally (one boundary transpose each way, as in
models/nlospose.py); the LCT constants ride along as an LCTParams pytree so
the whole forward is one jittable pure function.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hiddenpose_tpu.models.blocks import Transient2Volumn
from hiddenpose_tpu.ops.lct import LCTParams, lct_apply, make_lct_params
from hiddenpose_tpu.ops.normalize import normalize


class DeepVoxels(nn.Module):
    """basedim mirrors the reference's nf0 (`feature.py:50,84`)."""

    basedim: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, lct: LCTParams
    ) -> jax.Array:  # (B, C, T, H, W) -> (B, basedim+C, Zc, H/2, W/2)
        b = x.shape[0]
        # Per-(batch, channel) min/max normalisation (`feature.py:18-30`).
        x = normalize(x)

        # NCDHW -> NDHWC at the boundary.
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        h = Transient2Volumn(
            basedim=self.basedim, dtype=self.dtype, name="downnet"
        )(h)  # (B, T/2, H/2, W/2, basedim + C)

        # Physics layer on every channel: fold channels into batch.
        ch = h.shape[-1]
        flat = jnp.transpose(h, (0, 4, 1, 2, 3)).reshape(
            b * ch, *h.shape[1:4]
        )
        vol = jax.checkpoint(lct_apply)(flat.astype(jnp.float32), lct)
        vol = vol.reshape(b, ch, *vol.shape[1:])

        # Crop the far end of the depth axis (`feature.py:128-132`).
        zdim = vol.shape[2]
        vol = vol[:, :, : zdim * 100 // 128]

        # ReLU -> normalize -> x1e5 (`feature.py:134-137`).
        vol = jax.nn.relu(vol)
        vol = normalize(vol) * 1.0e5
        return vol


def deepvoxels_noise(rng: jax.Array, data: jax.Array) -> jax.Array:
    """The reference's (disabled) gaussian+poisson-ish noise model
    (`feature.py:113-116`): kept callable for parity, not wired into
    DeepVoxels.__call__ — the reference's forward skips it too."""
    k1, k2 = jax.random.split(rng)
    gau = 0.05 + 0.03 * jax.random.normal(k1, data.shape, data.dtype) + data
    return 0.03 * jax.random.normal(k2, data.shape, data.dtype) * gau + gau


def build_deepvoxels(
    basedim: int = 16,
    image_size: int = 256,
    time_size: int = 512,
    bin_len: float = 0.01,
    wall_size: float = 2.0,
    mode: str = "lct",
) -> Tuple[DeepVoxels, LCTParams]:
    """Construct the module plus LCT constants at the post-downsample grid.

    Mirrors the wiring of `feature.py:87-100`: spatial = image_size // 2
    (Transient2volumn is stride 2), bin_len x2 (temporal stride 2)."""
    model = DeepVoxels(basedim=basedim)
    lct = make_lct_params(
        image_size=image_size // 2,
        time_size=time_size // 2,
        bin_len=bin_len * 2,
        wall_size=wall_size,
        mode=mode,
    )
    return model, lct
