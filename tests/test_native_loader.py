"""Native (C++) HDR decoder / preprocess vs the Python reference path."""

import os
import struct

import numpy as np
import pytest

from hiddenpose_tpu.data import preprocess as pp
from hiddenpose_tpu.data import native_loader as nl


def _write_hdr(path: str, rgb: np.ndarray):
    """Minimal uncompressed (old-style) Radiance writer.  rgb: (H, W, 3)."""
    h, w, _ = rgb.shape
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        maxc = rgb.max(axis=2)
        out = np.zeros((h, w, 4), np.uint8)
        nonzero = maxc > 1e-32
        exp = np.zeros((h, w), np.int32)
        mant_scale = np.zeros((h, w), np.float64)
        m, e = np.frexp(np.where(nonzero, maxc, 1.0))
        exp = np.where(nonzero, e, 0)
        scale = np.where(nonzero, m * 256.0 / np.where(nonzero, maxc, 1.0), 0)
        for c in range(3):
            out[..., c] = np.clip(rgb[..., c] * scale, 0, 255).astype(np.uint8)
        out[..., 3] = np.where(nonzero, exp + 128, 0).astype(np.uint8)
        f.write(out.tobytes())


@pytest.fixture(scope="module")
def hdr_file(tmp_path_factory):
    rng = np.random.RandomState(410)
    h, w = 600 * 8, 8  # stacked-frame layout at tiny spatial size
    val = (rng.rand(h, w) * 5).astype(np.float64)
    rgb = np.stack([val, val, val], axis=-1)
    path = str(tmp_path_factory.mktemp("hdr") / "meas.hdr")
    _write_hdr(path, rgb)
    return path, val


def test_native_available():
    assert nl.available(), "native decoder failed to build"


def test_native_decode_matches_python(hdr_file):
    path, val = hdr_file
    got = nl.decode_hdr_gray_native(path)
    want = pp.decode_hdr_gray(path)
    assert got.shape == want.shape
    # Both are max-normalised grayscale; RGBE quantisation dominates error.
    np.testing.assert_allclose(got, want, atol=6e-3)


def test_native_preprocess_matches_python(hdr_file):
    path, _ = hdr_file
    gray = nl.decode_hdr_gray_native(path)
    got = nl.preprocess_meas_native(gray, t_frames=600, crop=512,
                                    downsample_cnt=1)
    want = pp.preprocess_measurement(gray, downsample_cnt=1, t=600, crop=512)
    assert got.shape == want.shape == (128, 4, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_load_measurement_end_to_end(hdr_file):
    path, _ = hdr_file
    meas = nl.load_measurement(path)
    assert meas.shape == (128, 4, 4)
    assert np.isfinite(meas).all()
