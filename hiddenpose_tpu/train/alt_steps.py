"""Alternate training steps for the other coordinate representations.

The reference carries three additional per-iteration loops selected by
``cfg.MODEL.COORD_REPRESENTATION`` (`train.py:160,195`):
* `utils/train_3d_heatmap.py:8-43` — 3D heatmap joints loss only (no voxel
  supervision).
* `utils/train_2d_heatmap.py:8-44` — 2D heatmap MSE vs Gaussian targets.
* `utils/train_simdr.py:8-89` — per-axis SimDR classification (NB: the
  reference's loss lines are commented out / incomplete; this implementation
  completes the obvious intent with the NMT criterion over per-axis logits).

Here they are jitted step factories over the same TrainState machinery.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hiddenpose_tpu.losses import (
    joints_mse_loss,
    l2_joint_location_loss,
    nmt_norm_criterion,
)
from hiddenpose_tpu.train.state import TrainState


def make_heatmap3d_step(model, lct=None):
    """3D-heatmap-only objective (train_3d_heatmap): joint loss, no voxel
    loss.  Batch: meas, joints, joints_vis."""

    def step(state: TrainState, batch, lct_params):
        def loss_fn(params):
            (heatmaps, _), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["meas"], lct_params, train=True,
                mutable=["batch_stats"],
            )
            loss = l2_joint_location_loss(
                heatmaps, batch["joints"], batch["joints_vis"]
            )
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads, new_bs), {"loss": loss}

    return jax.jit(step)


def make_heatmap2d_step(apply_fn):
    """2D-heatmap objective (train_2d_heatmap): JointsMSE vs precomputed
    Gaussian targets.  ``apply_fn(params, batch) -> (B, J, H, W) heatmaps``.
    Batch: inputs + target_heatmaps (B, J, H, W) + target_weight (B, J)."""

    def step(params, opt_state, tx, batch):
        def loss_fn(p):
            pred = apply_fn(p, batch)
            return joints_mse_loss(
                pred, batch["target_heatmaps"], batch.get("target_weight")
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, {"loss": loss}

    return step


def simdr_loss(
    logits_xyz: jax.Array,
    target_bins: jax.Array,
    target_weight: jax.Array,
    label_smoothing: float = 0.2,
) -> jax.Array:
    """Per-axis SimDR classification loss.

    logits_xyz: (B, J, 3, K) per-axis logits; target_bins: (B, J, 3) integer
    bin indices; target_weight: (B, J).  Mean of the three per-axis NMT
    losses, visibility-weighted (`utils/criterion.py:46-63` semantics).
    """
    b, j, _, k = logits_xyz.shape
    total = 0.0
    for ax in range(3):
        lg = logits_xyz[:, :, ax].reshape(b * j, k)
        tb = target_bins[:, :, ax].reshape(b * j).astype(jnp.int32)
        per = nmt_norm_criterion(lg, tb, label_smoothing).reshape(b, j)
        total = total + (per * target_weight).mean()
    return total / 3.0


def make_simdr_step(model, label_smoothing: float = 0.2):
    """SimDR objective on a transformer model whose output is
    (B, J, p, K) with axes x/y/z in the first three p slots
    (`models/NlosPoseSformer.py:143-151` output shape)."""

    def step(params, opt_state, tx, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch["video"])
            return simdr_loss(
                out[:, :, :3], batch["target_bins"], batch["target_weight"],
                label_smoothing,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, {"loss": loss}

    return jax.jit(step, static_argnums=(2,))
