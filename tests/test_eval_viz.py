"""Metric + visualiser smoke tests."""

import os

import numpy as np

from hiddenpose_tpu.eval.metrics import mpjpe, pa_mpjpe, pck
from hiddenpose_tpu.viz.visualizer import joints_log, threeviews_log, volume_log


def test_mpjpe_basic():
    gt = np.zeros((2, 24, 3))
    pred = gt.copy()
    pred[:, :, 0] += 3.0  # uniform 3-voxel x offset
    np.testing.assert_allclose(mpjpe(pred, gt), 3.0)
    np.testing.assert_allclose(mpjpe(pred.reshape(2, 72), gt.reshape(2, 72)), 3.0)


def test_pa_mpjpe_invariant_to_rigid_transform():
    rng = np.random.RandomState(0)
    gt = rng.randn(1, 24, 3)
    # rotate + translate + scale the prediction
    theta = 0.7
    r = np.asarray([
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1],
    ])
    pred = 2.0 * gt @ r.T + np.asarray([5.0, -3.0, 1.0])
    assert pa_mpjpe(pred, gt) < 1e-6
    assert mpjpe(pred, gt) > 1.0


def test_pck():
    gt = np.zeros((1, 24, 3))
    pred = gt.copy()
    pred[0, :12, 0] = 5.0
    np.testing.assert_allclose(pck(pred, gt, threshold=1.0), 0.5)


def test_visualizers_write_files(tmp_path):
    vol = np.random.RandomState(0).rand(1, 1, 8, 8, 8).astype(np.float32)
    joints = np.random.RandomState(1).rand(24, 3) * 8
    p1 = volume_log(vol, str(tmp_path), "vol", 1, joints=joints)
    p2 = threeviews_log(vol, str(tmp_path), "views", 1)
    p3 = joints_log(joints, str(tmp_path), "joints", 1)
    for p in (p1, p2, p3):
        assert os.path.exists(p)
    assert os.path.exists(os.path.join(str(tmp_path), "joints.txt"))
