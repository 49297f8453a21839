"""Pallas phase max-pool kernels (`ops/pallas/phase_pool.py`) —
interpreter-mode equivalence with the XLA slice-chain reference
(`ops/space_to_depth.py::phase_maxpool_k3s2`) and its autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.ops.pallas.phase_pool import (
    phase_maxpool_diff,
    phase_maxpool_pallas,
    phase_maxpool_vjp_pallas,
)
from hiddenpose_tpu.ops.space_to_depth import phase_maxpool_k3s2

RNG = np.random.RandomState(7)

SHAPES = [(1, 8, 8, 8, 16), (2, 4, 8, 16, 16), (1, 4, 16, 8, 32)]


@pytest.mark.parametrize("shape", SHAPES)
def test_phase_pool_fwd_bit_exact(shape):
    b, d2, h2, w2, c = shape
    y2 = jnp.asarray(RNG.randn(b, d2, h2, w2, 8 * c).astype(np.float32))
    want = np.asarray(phase_maxpool_k3s2(y2))
    got = np.asarray(phase_maxpool_pallas(y2, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("tied", [False, True])
def test_phase_pool_vjp(tied):
    """VJP matches autodiff of the slice-chain (incl. the 0.5/0.5 max tie
    splitting — `tied` runs on ReLU-style data with many exact zeros).
    Tolerance is 1-2 ulp: where one source element feeds several outputs
    the accumulation order differs from XLA's."""
    b, d2, h2, w2, c = 1, 8, 8, 8, 16
    y2 = RNG.randn(b, d2, h2, w2, 8 * c).astype(np.float32)
    if tied:
        y2 = np.maximum(y2, 0.0)
    y2 = jnp.asarray(y2)
    g = jnp.asarray(RNG.randn(b, d2, h2, w2, c).astype(np.float32))
    want = np.asarray(jax.vjp(phase_maxpool_k3s2, y2)[1](g)[0])
    got = np.asarray(phase_maxpool_vjp_pallas(y2, g, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_phase_pool_diff_roundtrip():
    """grad through phase_maxpool_diff == grad through the XLA chain."""
    b, d2, h2, w2, c = 1, 4, 8, 8, 16
    y2 = jnp.asarray(RNG.randn(b, d2, h2, w2, 8 * c).astype(np.float32))
    cot = jnp.asarray(RNG.randn(b, d2, h2, w2, c).astype(np.float32))
    g_ref = jax.grad(lambda y: jnp.sum(phase_maxpool_k3s2(y) * cot))(y2)
    g_pal = jax.grad(lambda y: jnp.sum(phase_maxpool_diff(y) * cot))(y2)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=0, atol=2e-6)
