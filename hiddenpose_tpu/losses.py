"""Training losses.

Re-designs of `/root/reference/utils/criterion.py` as pure functions:
* :func:`l2_joint_location_loss` — soft-argmax + visibility-weighted MSE
  (`utils/criterion.py:66-87,156-162`).
* :func:`bce_dice_loss` — BCE-with-logits + (1 - Dice) voxel supervision
  (`utils/criterion.py:348-385`).
* :func:`joints_mse_loss` — 2D-heatmap MSE vs Gaussian targets
  (`utils/criterion.py:166-270`).
* :func:`nmt_norm_criterion` — SimDR KL / label-smoothing loss
  (`utils/criterion.py:10-63`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hiddenpose_tpu.ops.softargmax import softmax_integral


def weighted_mse_loss(pred, target, weights, size_average: bool = True):
    """(pred - target)^2 * weights, summed; /batch if size_average
    (`utils/criterion.py:156-162`)."""
    out = ((pred - target) ** 2) * weights
    total = out.sum()
    return total / pred.shape[0] if size_average else total


def l2_joint_location_loss(
    heatmaps, gt_joints, gt_joints_vis, size_average: bool = True
):
    """3D-heatmap joint loss.

    heatmaps: (B, J, Z, Y, X) logits; gt_joints, gt_joints_vis: (B, J*3) in
    heatmap-voxel units (see `ops/softargmax.py` parity notes).
    """
    num_joints = gt_joints_vis.shape[1] // 3
    pred = softmax_integral(heatmaps, num_joints)
    gt_joints = jax.lax.stop_gradient(gt_joints)
    gt_joints_vis = jax.lax.stop_gradient(gt_joints_vis)
    return weighted_mse_loss(pred, gt_joints, gt_joints_vis, size_average)


def dice_loss(logits, targets, eps: float = 1e-9):
    """1 - global Dice over the whole batch (`utils/criterion.py:348-368`).

    Note the reference computes one Dice score over all samples jointly
    (sums before the ratio) — preserved.
    """
    probs = jax.nn.sigmoid(logits)
    intersection = 2.0 * (probs * targets).sum()
    union = probs.sum() + targets.sum()
    return 1.0 - (intersection + eps) / union


def bce_with_logits(logits, targets):
    """Mean binary cross-entropy from logits (torch BCEWithLogitsLoss),
    computed stably via max(x,0) - x*t + log1p(exp(-|x|))."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return loss.mean()


def bce_dice_loss(logits, targets):
    """BCE + Dice voxel loss (`utils/criterion.py:371-385`)."""
    return bce_with_logits(logits, targets) + dice_loss(logits, targets)


def joints_mse_loss(pred_heatmaps, gt_heatmaps, target_weight=None):
    """2D heatmap MSE, 0.5 * mean per joint, averaged over joints
    (`utils/criterion.py:241-270`).

    pred/gt: (B, J, ...) flattened per joint; target_weight: (B, J) or None.
    """
    b, j = pred_heatmaps.shape[:2]
    pred = pred_heatmaps.reshape(b, j, -1)
    gt = gt_heatmaps.reshape(b, j, -1)
    if target_weight is not None:
        w = target_weight.reshape(b, j, 1)
        pred = pred * w
        gt = gt * w
    per_joint = 0.5 * ((pred - gt) ** 2).mean(axis=(0, 2))
    return per_joint.sum() / j


def nmt_norm_criterion(
    logits, labels, label_smoothing: float = 0.2
):
    """SimDR classification loss over one coordinate axis.

    logits: (N, K) raw scores; labels: (N,) integer bin index.
    With smoothing > 0: KL(smoothed one-hot || log_softmax(logits)) per row
    mean, matching `utils/criterion.py:29-44`; else NLL.
    """
    n, k = logits.shape
    log_probs = jax.nn.log_softmax(logits, axis=1)
    if label_smoothing > 0:
        confidence = 1.0 - label_smoothing
        smooth = jnp.full((n, k), label_smoothing / (k - 1), logits.dtype)
        one_hot = smooth.at[jnp.arange(n), labels].set(confidence)
        # torch KLDivLoss(reduction='none')(log_q, p) = p * (log p - log_q),
        # with p*log(p) terms where p>0; mean over classes per row.
        p = one_hot
        kl = jnp.where(p > 0, p * (jnp.log(jnp.clip(p, 1e-12)) - log_probs), 0.0)
        return kl.mean(axis=1)
    return -log_probs[jnp.arange(n), labels]
