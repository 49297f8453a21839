"""Loss-function hand cases mirroring the reference's inline loss tests
(`/root/reference/utils/criterion.py:412-450`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hiddenpose_tpu import losses
from hiddenpose_tpu.ops.softargmax import softmax_integral


def _delta_heatmaps(batch, joints, dims, peaks):
    """Logit volumes that softmax to (near) delta functions at `peaks`."""
    z, y, x = dims
    hm = np.full((batch, joints, z, y, x), -1000.0, dtype=np.float32)
    for (b, j, pz, py, px) in peaks:
        hm[b, j, pz, py, px] = 1000.0
    return hm


def test_softargmax_recovers_peaks():
    dims = (5, 5, 5)
    hm = _delta_heatmaps(1, 3, dims, [(0, 0, 1, 2, 3), (0, 1, 4, 0, 2), (0, 2, 2, 2, 2)])
    coords = np.asarray(softmax_integral(jnp.asarray(hm), 3)).reshape(1, 3, 3)
    # Output is (x, y, z) per joint in voxel units (no re-centering —
    # utils/criterion.py:142-144 is commented out in the reference).
    np.testing.assert_allclose(coords[0, 0], [3, 2, 1], atol=1e-4)
    np.testing.assert_allclose(coords[0, 1], [2, 0, 4], atol=1e-4)
    np.testing.assert_allclose(coords[0, 2], [2, 2, 2], atol=1e-4)


def test_softargmax_uniform_gives_center():
    hm = np.zeros((2, 4, 8, 8, 8), dtype=np.float32)
    coords = np.asarray(softmax_integral(jnp.asarray(hm), 4))
    np.testing.assert_allclose(coords, 3.5, atol=1e-5)


def test_l2_joint_location_loss_zero_at_match():
    # Mirror of the reference hand case (utils/criterion.py:412-443):
    # joint 0 peaks at (1,1,1), gt (1,1,1) -> contribution 0;
    # other joints peak at (0,0,0) with gt (0,0,0).
    dims = (5, 5, 5)
    peaks = [(0, 0, 1, 1, 1)] + [(0, j, 0, 0, 0) for j in range(1, 24)]
    hm = _delta_heatmaps(1, 24, dims, peaks)
    gt = np.zeros((1, 24, 3), dtype=np.float32)
    gt[0, 0] = [1, 1, 1]
    gt = gt.reshape(1, 72)
    vis = np.ones_like(gt)
    loss = losses.l2_joint_location_loss(
        jnp.asarray(hm), jnp.asarray(gt), jnp.asarray(vis)
    )
    assert float(loss) < 1e-6


def test_l2_joint_location_loss_visibility_weighting():
    dims = (5, 5, 5)
    hm = _delta_heatmaps(1, 24, dims, [(0, j, 0, 0, 0) for j in range(24)])
    gt = np.zeros((1, 72), dtype=np.float32)
    gt[0, :3] = [2.0, 0.0, 0.0]  # joint 0 gt x off by 2
    vis = np.ones_like(gt)
    loss_full = float(losses.l2_joint_location_loss(jnp.asarray(hm), gt, vis))
    np.testing.assert_allclose(loss_full, 4.0, atol=1e-4)  # (2-0)^2 / batch
    vis[0, 0] = 0.0  # mask the offending coordinate
    loss_masked = float(losses.l2_joint_location_loss(jnp.asarray(hm), gt, vis))
    assert loss_masked < 1e-6


def test_bce_dice_matches_manual():
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 64).astype(np.float32)
    targets = (rng.rand(2, 64) > 0.5).astype(np.float32)
    got = float(losses.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))

    # manual, float64
    p = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    bce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p)).mean()
    dice = 1.0 - (2.0 * (p * targets).sum() + 1e-9) / (p.sum() + targets.sum())
    np.testing.assert_allclose(got, bce + dice, rtol=1e-5)


def test_dice_perfect_prediction_near_zero():
    targets = np.ones((1, 32), dtype=np.float32)
    logits = np.full((1, 32), 20.0, dtype=np.float32)
    assert float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(targets))) < 1e-4


def test_joints_mse_loss_zero_on_match():
    hm = np.random.RandomState(0).rand(2, 4, 8, 8).astype(np.float32)
    assert float(losses.joints_mse_loss(hm, hm)) == 0.0


def test_nmt_norm_criterion_prefers_correct_class():
    logits_good = jnp.asarray([[10.0, 0.0, 0.0]])
    logits_bad = jnp.asarray([[0.0, 10.0, 0.0]])
    labels = jnp.asarray([0])
    good = float(losses.nmt_norm_criterion(logits_good, labels).mean())
    bad = float(losses.nmt_norm_criterion(logits_bad, labels).mean())
    assert good < bad


def test_simdr_decode_recovers_peak():
    from hiddenpose_tpu.ops.softargmax import simdr_decode

    logits = np.full((1, 2, 3, 16), -1000.0, dtype=np.float32)
    logits[0, 0, 0, 10] = 1000.0  # joint 0 x at bin 10
    logits[0, 0, 1, 4] = 1000.0
    logits[0, 0, 2, 8] = 1000.0
    logits[0, 1, :, 0] = 1000.0
    out = np.asarray(simdr_decode(jnp.asarray(logits), split_ratio=2.0))
    np.testing.assert_allclose(out[0, 0], [5.0, 2.0, 4.0], atol=1e-4)
    np.testing.assert_allclose(out[0, 1], [0.0, 0.0, 0.0], atol=1e-4)
