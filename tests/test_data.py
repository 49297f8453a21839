"""Data pipeline tests: preprocessing parity + synthetic generator +
pipeline mechanics (the reference has no data tests — SURVEY §4)."""

import numpy as np
import pytest

from hiddenpose_tpu.config import default_config
from hiddenpose_tpu.data import preprocess as pp
from hiddenpose_tpu.data import synthetic
from hiddenpose_tpu.data.dataset import DataPipeline, SyntheticSource, collate


def test_rebin_pairs():
    x = np.arange(8.0)
    np.testing.assert_allclose(pp.rebin_pairs(x, 0), [0.5, 2.5, 4.5, 6.5])


def test_preprocess_measurement_shapes():
    # (600*8, 8) stacked frames -> crop 512 -> temporal avg 256 -> /2 -> 128
    gray = np.random.RandomState(0).rand(600 * 8, 8).astype(np.float32)
    meas = pp.preprocess_measurement(gray, downsample_cnt=1, t=600, crop=512)
    assert meas.shape == (128, 4, 4)


def test_map_joints_reference_affine():
    # A joint at the normalised origin maps to voxel
    # (225-128, 256-128, 128)/4 = (24.25, 32, 32)
    # per utils/nlos_pose_dataloader.py:132-144.
    j = np.zeros((1, 3))
    out = pp.map_joints_to_heatmap(j, vol_size=256, heatmap_size=64)
    np.testing.assert_allclose(out[0], [(225 - 128) / 4, 128 / 4, 128 / 4])

    # x shifts move the last (w) coordinate positively.
    j2 = np.asarray([[0.5, 0.0, 0.0]])
    out2 = pp.map_joints_to_heatmap(j2)
    assert out2[0, 2] > out[0, 2]
    # y shifts move h negatively (image-down convention).
    j3 = np.asarray([[0.0, 0.5, 0.0]])
    out3 = pp.map_joints_to_heatmap(j3)
    assert out3[0, 1] < out[0, 1]


def test_synthetic_sample_is_deterministic():
    a = synthetic.make_sample(7, time_size=32, image_size=16, grid=16,
                              heatmap_size=8, bin_len=0.16)
    b = synthetic.make_sample(7, time_size=32, image_size=16, grid=16,
                              heatmap_size=8, bin_len=0.16)
    np.testing.assert_array_equal(a["meas"], b["meas"])
    np.testing.assert_array_equal(a["joints"], b["joints"])
    assert a["meas"].shape == (1, 32, 16, 16)
    assert a["vol"].shape == (1, 16, 16, 16)
    assert a["joints"].shape == (24, 3)
    assert a["meas"].max() <= 1.0 and a["meas"].min() >= 0.0
    assert a["vol"].sum() > 0


def test_add_noise_properties():
    rng = np.random.RandomState(0)
    gray = rng.rand(64, 8).astype(np.float32) * 100
    noised = pp.add_noise(gray, sigma=2.0, rng=np.random.RandomState(1))
    assert noised.shape == gray.shape
    assert (noised >= 0).all()
    assert noised.dtype == np.float32
    # Poisson sampling makes values integral.
    np.testing.assert_array_equal(noised, np.round(noised))


def test_pipeline_batching_and_determinism():
    cfg = default_config().tiny(16)
    src = SyntheticSource(cfg, length=6)
    pipe = DataPipeline(src, batch_size=2, shuffle=True, seed=1, num_workers=2)
    batches = list(pipe)
    assert len(batches) == 3
    b = batches[0]
    assert b["meas"].shape == (2, 1, 16, 16, 16)
    assert b["vol"].shape == (2, 1, 16, 16, 16)
    assert b["joints"].shape == (2, 72)
    assert b["joints_vis"].shape == (2, 72)

    # Same seed + epoch -> same order.
    pipe2 = DataPipeline(src, batch_size=2, shuffle=True, seed=1, num_workers=2)
    b2 = next(iter(pipe2))
    np.testing.assert_array_equal(b["meas"], b2["meas"])


def test_collate_flattens_joints():
    s = [synthetic.make_sample(i, 16, 8, 8, 4, 0.32) for i in range(2)]
    batch = collate(s)
    assert batch["joints"].shape == (2, 72)
    assert batch["person_id"] == ["synthetic-0", "synthetic-1"]
