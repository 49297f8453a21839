"""Bit-exactness of the Pallas planes-layout max-pool backward
(`ops/pallas/pool2p.py`) against the elementwise XLA formulation it
replaces on TPU (`models/unet3d.py::_max_pool2_bwd`), which is itself
pinned to select_and_scatter semantics by tests/test_unet3d.py.

Runs the kernel in interpret mode (CPU); the on-chip path is exercised by
the train-step integration tests on TPU hosts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.models.unet3d import _max_pool2_bwd, _max_pool2_impl
from hiddenpose_tpu.ops.pallas.pool2p import pool2_bwd_planes_pallas

# The four UNet pool levels (B, C, D, H, W), depth shrunk to keep CPU
# interpret runtime sane — D only affects the plane loop count.
SHAPES = [
    (1, 2, 4, 32, 128),   # level-1-like: full lane tile
    (1, 2, 4, 32, 64),    # sub-128 lanes (host pad path)
    (2, 3, 4, 32, 32),
    (1, 2, 2, 16, 16),    # smallest level: H/2 = 8 sublanes
]


def _xla_bwd(x, dy):
    y = _max_pool2_impl(x)
    (dx,) = _max_pool2_bwd((x, y), dy)
    return dx


@pytest.mark.parametrize("shape", SHAPES)
def test_pool2p_bwd_matches_xla_random(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    dyshape = (*shape[:2], shape[2] // 2, shape[3] // 2, shape[4] // 2)
    dy = jnp.asarray(rng.randn(*dyshape).astype(np.float32))
    ref = np.asarray(_xla_bwd(x, dy))
    got = np.asarray(pool2_bwd_planes_pallas(x, dy, interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_pool2p_bwd_matches_xla_ties(shape):
    """Integer-valued inputs force frequent ties; first-match routing must
    agree exactly."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randint(0, 3, size=shape).astype(np.float32))
    dyshape = (*shape[:2], shape[2] // 2, shape[3] // 2, shape[4] // 2)
    dy = jnp.asarray(rng.randn(*dyshape).astype(np.float32))
    ref = np.asarray(_xla_bwd(x, dy))
    got = np.asarray(pool2_bwd_planes_pallas(x, dy, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pool2p_bwd_all_ties():
    """Constant input: every window is an 8-way tie; the cotangent must go
    to the (0,0,0) corner of each window only."""
    shape = (1, 1, 4, 32, 32)
    x = jnp.ones(shape, jnp.float32)
    dyshape = (1, 1, 2, 16, 16)
    rng = np.random.RandomState(2)
    dy = jnp.asarray(rng.randn(*dyshape).astype(np.float32))
    ref = np.asarray(_xla_bwd(x, dy))
    got = np.asarray(pool2_bwd_planes_pallas(x, dy, interpret=True))
    np.testing.assert_array_equal(got, ref)
    # Corner routing + total-mass conservation.
    assert np.allclose(got.sum(), np.asarray(dy).sum(), rtol=1e-6)
    assert (got[:, :, 1::2] == 0).all()
    assert (got[:, :, :, 1::2] == 0).all()
    assert (got[:, :, :, :, 1::2] == 0).all()


def test_pool2p_bwd_negative_values():
    """Negative-dominated volumes (post-GN activations can be negative;
    guards the recomputed-max path against sign assumptions)."""
    shape = (1, 2, 4, 16, 32)
    rng = np.random.RandomState(3)
    x = jnp.asarray((-np.abs(rng.randn(*shape)) - 1.0).astype(np.float32))
    dyshape = (*shape[:2], shape[2] // 2, shape[3] // 2, shape[4] // 2)
    dy = jnp.asarray(rng.randn(*dyshape).astype(np.float32))
    ref = np.asarray(_xla_bwd(x, dy))
    got = np.asarray(pool2_bwd_planes_pallas(x, dy, interpret=True))
    np.testing.assert_array_equal(got, ref)
