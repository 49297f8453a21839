"""Real-capture / fk-capture / vol .mat loading tests with synthetic
fixtures (mirroring `utils/loadrealdata.py` and `test.py:147-155` paths)."""

import numpy as np
import pytest
from scipy.io import savemat

from hiddenpose_tpu.data import preprocess as pp
from hiddenpose_tpu.models.blocks import Transient2Volumn


def test_load_realdata(tmp_path):
    # (h, w, t) 'data_new' capture → (t/2, w, h) after pair-avg, then /2^cnt.
    rng = np.random.RandomState(0)
    data = rng.rand(8, 8, 32).astype(np.float32)
    f = str(tmp_path / "cap.mat")
    savemat(f, {"data_new": data})
    out = pp.load_realdata(f, downsample_cnt=1)
    assert out.shape == (8, 4, 4)
    # first output bin = mean of 4 source bins (pair-avg then halving),
    # averaged over the 2x2 spatial block, transposed (t, w, h).
    manual = data.transpose(2, 1, 0)
    manual = (manual[::2] + manual[1::2]) / 2
    for ax in range(3):
        sl0 = [slice(None)] * 3
        sl1 = [slice(None)] * 3
        sl0[ax] = slice(0, None, 2)
        sl1[ax] = slice(1, None, 2)
        manual = (manual[tuple(sl0)] + manual[tuple(sl1)]) / 2
    np.testing.assert_allclose(out, manual, rtol=1e-6)


def test_load_fk_measurement(tmp_path):
    # (h, w, t) 'meas': temporal pair-avg x2, centre-crop, → (t, h, w).
    rng = np.random.RandomState(1)
    data = rng.rand(4, 4, 64).astype(np.float32)
    f = str(tmp_path / "fk.mat")
    savemat(f, {"meas": data})
    out = pp.load_fk_measurement(f, rebin_count=2, time_crop=(4, 12))
    assert out.shape == (8, 4, 4)
    rebinned = data
    for _ in range(2):
        rebinned = (rebinned[:, :, ::2] + rebinned[:, :, 1::2]) / 2
    manual = np.transpose(rebinned[:, :, 4:12], (2, 0, 1))
    np.testing.assert_allclose(out, manual, rtol=1e-6)


def test_load_vol_mat(tmp_path):
    vol = np.random.RandomState(2).rand(4, 4, 4).astype(np.float32)
    f = str(tmp_path / "vol.mat")
    savemat(f, {"vol": vol})
    np.testing.assert_allclose(pp.load_vol_mat(f), vol)


def test_transient2volumn_concat_shapes():
    import jax
    import jax.numpy as jnp

    m = Transient2Volumn(basedim=2)
    x = jnp.ones((1, 8, 8, 8, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    # stride-2, concat(fixed 1ch, learned basedim) = basedim+1 channels.
    assert y.shape == (1, 4, 4, 4, 3)
