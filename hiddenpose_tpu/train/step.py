"""The jitted training / evaluation step.

Re-design of the reference's per-iteration body
(`/root/reference/utils/train_epoch.py:32-76`): forward, joint loss
(L2JointLocation via soft-argmax) + voxel loss (BCE+Dice on the UNet
refinement vs the GT volume), backward, Adam update — all fused into one
XLA program.  Under a `jax.sharding.Mesh` the batch axis is sharded and
gradient all-reduce happens automatically through `jit` autodiff.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hiddenpose_tpu.losses import bce_dice_loss, l2_joint_location_loss
from hiddenpose_tpu.models.nlospose import NlosPose
from hiddenpose_tpu.ops.lct import LCTParams
from hiddenpose_tpu.ops.softargmax import softmax_integral
from hiddenpose_tpu.train.state import TrainState

Batch = Dict[str, jax.Array]
# Batch fields: meas (B, 1, T, H, W), vol (B, 1, D, H, W),
#               joints (B, J*3), joints_vis (B, J*3)


def make_train_step(model: NlosPose, donate: bool = True,
                    matmul_precision: str = "default"):
    """Returns train_step(state, batch, lct) -> (state, metrics).

    ``matmul_precision`` ('default' | 'high' | 'highest',
    cfg.train.matmul_precision) sets the MXU pass count for every
    matmul/conv traced into the step.  At 'default' the TPU runs ONE
    bf16 pass per f32 matmul; round-5 measured that this costs real
    model quality on this recipe (identical data/init/order, 2 epochs:
    ep1 loss 1513 at default vs 583 at highest — tpu_jobs/129cb, 135a)
    while 'highest' costs ~3.5x step time.  The LCT resampling matmuls
    have their own near-free knob (HP_LCT_PREC, ops/lct.py)."""

    def train_step(
        state: TrainState, batch: Batch, lct: LCTParams
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        def loss_fn(params):
            (heatmaps, refine), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["meas"], lct, train=True, mutable=["batch_stats"],
            )
            joint_loss = l2_joint_location_loss(
                heatmaps, batch["joints"], batch["joints_vis"]
            )
            b = refine.shape[0]
            voxel_loss = bce_dice_loss(
                refine.reshape(b, -1), batch["vol"].reshape(b, -1)
            )
            loss = joint_loss + voxel_loss
            return loss, (mutated["batch_stats"], joint_loss, voxel_loss)

        # The context applies at trace time (inside jit it wraps the
        # primitive binds of the whole fwd+bwd program).
        with jax.default_matmul_precision(matmul_precision):
            (loss, (new_bs, joint_loss, voxel_loss)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(state.params))
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {
            "loss": loss,
            "joint_loss": joint_loss,
            "voxel_loss": voxel_loss,
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: NlosPose):
    """Returns eval_step(state, batch, lct) -> dict with joints preds +
    losses, mirroring `test.py:208-238`."""

    def eval_step(state: TrainState, batch: Batch, lct: LCTParams):
        heatmaps, refine = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["meas"], lct, train=False,
        )
        # see make_forward: guards an XLA layout-assignment bug in the
        # fused heatmap->soft-argmax transposes at some grid sizes.
        heatmaps = jax.lax.optimization_barrier(heatmaps)
        num_joints = heatmaps.shape[1]
        preds = softmax_integral(heatmaps, num_joints)
        out = {"pred_joints": preds, "heatmaps": heatmaps, "refine": refine}
        if "joints" in batch:
            out["joint_loss"] = l2_joint_location_loss(
                heatmaps, batch["joints"], batch["joints_vis"]
            )
        return out

    return jax.jit(eval_step)


def make_forward(model: NlosPose):
    """Pure inference: meas -> (pred_joints, heatmaps). The meas→joints
    benchmark path (BASELINE configs[0,2])."""

    def forward(variables, meas, lct: LCTParams):
        heatmaps, _ = model.apply(variables, meas, lct, train=False)
        # optimization_barrier: without it XLA's layout assignment on this
        # toolchain trips over the fused heatmap->marginal transposes at
        # some grid sizes ("Expected instruction to have shape f32[32,24],
        # actual f32[24,32]{T(8,128)}" post-optimization error at 64^3).
        heatmaps = jax.lax.optimization_barrier(heatmaps)
        return softmax_integral(heatmaps, heatmaps.shape[1]), heatmaps

    return jax.jit(forward)
