"""Golden-reference tests for the LCT reconstruction core.

The production path (closed-form resampling + one-sided rFFT,
`hiddenpose_tpu/ops/{psf,lct}.py`) is checked against an independent NumPy
implementation that follows the reference construction literally
(`hiddenpose_tpu/ops/lct_reference.py`, mirroring `/root/reference/utils/lct.py`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.ops import lct as lct_ops
from hiddenpose_tpu.ops import lct_reference as ref
from hiddenpose_tpu.ops import psf as psf_ops


@pytest.mark.parametrize("M", [8, 16, 32])
def test_resampling_operator_matches_dense(M):
    mtx, mtxi = psf_ops.resampling_operator(M)
    dmtx, dmtxi = ref.resampling_operator_dense(M)
    np.testing.assert_allclose(mtx, dmtx, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(mtxi, dmtxi, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("N,M", [(8, 8), (16, 8), (8, 16)])
def test_define_psf_matches_meshgrid(N, M):
    slope = 0.5
    np.testing.assert_allclose(
        psf_ops.define_psf(N, M, slope), ref.define_psf_meshgrid(N, M, slope),
        rtol=1e-6, atol=1e-7,
    )


def test_psf_unit_mass():
    p = psf_ops.define_psf(16, 16, 1.0)
    assert p.shape == (32, 32, 32)
    np.testing.assert_allclose((p ** 2).sum(), 1.0, rtol=1e-5)


@pytest.mark.parametrize("mode", ["lct", "bp"])
@pytest.mark.parametrize("material", ["diffuse", "specular"])
def test_lct_apply_matches_numpy_golden(mode, material):
    N, T = 16, 16
    bin_len = 0.04
    rng = np.random.RandomState(410)
    meas = rng.rand(2, T, N, N).astype(np.float32)

    params = lct_ops.make_lct_params(
        N, T, bin_len, wall_size=2.0, mode=mode, material=material
    )
    got = np.asarray(jax.jit(lambda m: lct_ops.lct_apply(m, params))(meas))

    for b in range(meas.shape[0]):
        want = ref.lct_numpy(
            meas[b], bin_len, wall_size=2.0, material=material, mode=mode
        )
        if mode == "bp":
            # bp additionally LoG-sharpens; golden covers only the pre-sharpen
            # math, so check the linear part by comparing 'bp' without sharpen:
            # apply the same conv in numpy.
            k = psf_ops.filter_laplacian()
            p = 2
            padded = np.pad(want, p, mode="edge")
            out = np.zeros_like(want)
            for dz in range(5):
                for dy in range(5):
                    for dx in range(5):
                        out += (
                            k[dz, dy, dx]
                            * padded[dz:dz + T, dy:dy + N, dx:dx + N]
                        )
            out[:1] = 0.0
            want = out
        # float32 FFT cancellation noise: the Wiener filter attenuates the
        # output to ~1e-4 of the input scale, so compare relative to the
        # peak and require near-perfect correlation.  'bp' is noisier still:
        # its conj-only filter keeps high frequencies and the LoG sharpening
        # is a second-derivative amplifier.
        atol = 1e-1 if mode == "bp" else 1e-2
        min_corr = 0.995 if mode == "bp" else 0.9995
        scale = np.abs(want).max() + 1e-12
        np.testing.assert_allclose(got[b] / scale, want / scale, atol=atol)
        corr = np.corrcoef(got[b].ravel(), want.ravel())[0, 1]
        assert corr > min_corr, f"corr={corr}"


def test_time_window_embedding():
    N, T = 8, 16
    params = lct_ops.make_lct_params(N, T, 0.04)
    rng = np.random.RandomState(0)
    meas = rng.rand(1, 8, N, N).astype(np.float32)
    # Embedding [4, 12) must equal manual zero-padding.
    padded = np.zeros((1, T, N, N), dtype=np.float32)
    padded[:, 4:12] = meas
    a = lct_ops.lct_apply(jnp.asarray(meas), params, time_begin=4, time_end=12)
    b = lct_ops.lct_apply(jnp.asarray(padded), params)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_lct_channelled_signature():
    N, T = 8, 8
    params = lct_ops.make_lct_params(N, T, 0.04)
    meas = np.random.RandomState(1).rand(2, 3, T, N, N).astype(np.float32)
    out = lct_ops.lct_apply_bdthw(jnp.asarray(meas), params)
    assert out.shape == (2, 3, T, N, N)
    # channel folding must equal per-channel application
    single = lct_ops.lct_apply(jnp.asarray(meas[:, 1]), params)
    np.testing.assert_allclose(
        np.asarray(out[:, 1]), np.asarray(single), rtol=1e-5, atol=1e-6
    )


def test_lct_is_differentiable():
    N, T = 8, 8
    params = lct_ops.make_lct_params(N, T, 0.04)
    meas = jnp.ones((1, T, N, N), dtype=jnp.float32)

    def loss(m):
        return jnp.sum(lct_ops.lct_apply(m, params) ** 2)

    g = jax.grad(loss)(meas)
    assert g.shape == meas.shape
    assert bool(jnp.isfinite(g).all())


def test_lct_batch_chunk_equivalence():
    """lax.map-chunked filtering (VERDICT round-1 #8) == fully batched."""
    N, T = 8, 8
    params = lct_ops.make_lct_params(N, T, 0.04)
    meas = np.random.RandomState(2).rand(8, T, N, N).astype(np.float32)
    full = lct_ops.lct_apply(jnp.asarray(meas), params)
    chunked = lct_ops.lct_apply(jnp.asarray(meas), params, batch_chunk=2)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), rtol=1e-5, atol=1e-6
    )
    # chunk >= batch or non-dividing chunk: falls back to fully batched
    same = lct_ops.lct_apply(jnp.asarray(meas), params, batch_chunk=16)
    np.testing.assert_allclose(np.asarray(same), np.asarray(full), rtol=1e-6)
    odd = lct_ops.lct_apply(jnp.asarray(meas), params, batch_chunk=3)
    np.testing.assert_allclose(
        np.asarray(odd), np.asarray(full), rtol=1e-5, atol=1e-6
    )
