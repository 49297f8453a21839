"""Tests for auxiliary ops: multi-view resampler, wave ops, target
generators, normalisation."""

import numpy as np
import pytest

import jax.numpy as jnp

from hiddenpose_tpu.data import targets as tg
from hiddenpose_tpu.ops.normalize import normalize, normalize_feature
from hiddenpose_tpu.ops.resample import (
    MultiViewResampler,
    grid_sample_3d,
    view_rotations,
)
from hiddenpose_tpu.ops.wave import (
    gaussian_window,
    virtual_wave_kernels,
    wave_convolve,
)


def test_view_rotations_are_rotations():
    mats = view_rotations()
    assert mats.shape == (26, 3, 3)
    np.testing.assert_allclose(mats[0], np.eye(3), atol=1e-7)
    for m in mats:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)
    # Matches the reference's hardcoded second matrix
    # (utils/init_mats.py:117-118) to print precision — the hardcoded table
    # stores R^T (init_mats.py:170-171 transposes it before comparing
    # against the analytic construction).
    ref1_t = np.array([
        [0.760836, 0.0447155, -0.647402],
        [0.0447155, 0.99164, 0.121042],
        [0.647402, -0.121042, 0.752475],
    ]).T
    np.testing.assert_allclose(mats[1], ref1_t, atol=1e-5)


def test_grid_sample_identity():
    vol = np.random.RandomState(0).rand(1, 1, 6, 6, 6).astype(np.float32)
    from hiddenpose_tpu.ops.resample import _normalized_grid

    grid = _normalized_grid(6, 6, 6, align_corners=False)[None]
    out = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), vol, atol=1e-5)


def test_multiview_resampler_shapes():
    r = MultiViewResampler(spatial=8, tdim=8, trange=4.0, wall_size=2.0)
    vol = jnp.ones((2, 1, 8, 8, 8))
    out = r(vol, views=[0, 3])
    assert out.shape == (2, 1, 8, 8, 8)
    assert bool(jnp.isfinite(out).all())


def test_gaussian_window_symmetry():
    w = gaussian_window(9, 2.5)
    np.testing.assert_allclose(w, w[::-1], atol=1e-7)
    assert w.max() == w[4]


def test_wave_convolve_matches_numpy():
    # Signal must be longer than the kernel (np.convolve 'same' otherwise
    # returns kernel-length output); wl=0.05 -> 16-tap (even) kernel,
    # wl=0.2 -> 63-tap (odd): both alignments covered.
    rng = np.random.RandomState(0)
    data = rng.rand(128, 3, 3).astype(np.float32)
    bin_res = 32e-12
    wl = 0.05
    cyc = 3
    for wavelength in (0.05, 0.2):
        cos_got, sin_got = wave_convolve(
            jnp.asarray(data), bin_res, wavelength, cyc
        )
        cos_k, sin_k = virtual_wave_kernels(bin_res, wavelength, cyc)
        for i in range(3):
            for j in range(3):
                want_sin = np.convolve(data[:, i, j], sin_k, mode="same")
                want_cos = np.convolve(data[:, i, j], cos_k, mode="same")
                np.testing.assert_allclose(
                    np.asarray(sin_got[:, i, j]), want_sin, rtol=1e-4,
                    atol=1e-5,
                )
                np.testing.assert_allclose(
                    np.asarray(cos_got[:, i, j]), want_cos, rtol=1e-4,
                    atol=1e-5,
                )


def test_generate_sa_simdr():
    joints = np.asarray([[10.0, 20.0, 30.0], [500.0, 20.0, 30.0]])
    tx, ty, tz, w = tg.generate_sa_simdr(
        joints, image_size=(64, 64, 128), split_ratio=2.0, sigma=2.0
    )
    assert tx.shape == (2, 128) and ty.shape == (2, 128) and tz.shape == (2, 256)
    assert w[0, 0] == 1.0 and w[1, 0] == 0.0  # joint 1 far out of bounds
    # Peak at mu*split_ratio
    assert abs(int(np.argmax(tx[0])) - 20) <= 1
    np.testing.assert_allclose(
        tx[0].max(), 1 / (2.0 * np.sqrt(2 * np.pi)), rtol=1e-5
    )


def test_generate_gaussian_heatmaps():
    joints = np.asarray([[10.0, 20.0, 30.0]])
    hm2d, w2 = tg.generate_gaussian_heatmap_2d(joints, heatmap_size=(64, 64))
    assert hm2d.shape == (1, 64, 64)
    iy, ix = np.unravel_index(np.argmax(hm2d[0]), hm2d[0].shape)
    assert (ix, iy) == (10, 20)

    hm3d, w3 = tg.generate_gaussian_heatmap_3d(
        joints, heatmap_size=(64, 64, 64)
    )
    assert hm3d.shape == (1, 64, 64, 64)
    idx = np.unravel_index(np.argmax(hm3d[0]), hm3d[0].shape)
    assert idx == (10, 20, 30)
    np.testing.assert_allclose(hm3d[0].max(), 1.0, rtol=1e-6)


def test_normalize_ranges():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 4, 4) * 7 + 3)
    n = np.asarray(normalize(x))
    assert n.min() >= 0 and n.max() <= 1.0 + 1e-6
    nf = np.asarray(normalize_feature(x))
    np.testing.assert_allclose(nf.max(), 10.0, rtol=1e-5)
