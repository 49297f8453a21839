"""Pallas small-channel 3^3 stencil conv (`ops/pallas/conv3p.py`) —
interpreter-mode equivalence with the XLA reference on small shapes.
(On-TPU bit-accuracy was verified against Precision.HIGHEST convs during
round-2 bring-up; these CI tests pin the same semantics via interpret.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.ops.pallas.conv3p import conv3_planes, conv3_planes_xla

RNG = np.random.RandomState(0)


def _case(cin, cout, d, h, w, res=False, pre=None):
    x = jnp.asarray(RNG.randn(2, cin, d, h, w).astype(np.float32))
    k = jnp.asarray(RNG.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.2)
    b = jnp.asarray(RNG.randn(cout).astype(np.float32))
    r = (jnp.asarray(RNG.randn(2, cout, d, h, w).astype(np.float32))
         if res else None)
    ps = (jnp.asarray(RNG.rand(cin).astype(np.float32) + 0.5)
          if pre is not None else None)
    pb = (jnp.asarray(RNG.randn(cin).astype(np.float32))
          if pre is not None else None)
    return x, k, b, r, ps, pb


@pytest.mark.parametrize(
    "cin,cout,act,pad_mode,res,pre",
    [
        (1, 1, "none", "zero", False, None),
        (1, 1, "leaky", "edge", True, None),
        (2, 3, "relu", "zero", False, None),
        (3, 2, "none", "edge", False, True),
    ],
)
def test_conv3p_matches_xla(cin, cout, act, pad_mode, res, pre):
    d, h, w = 8, 16, 32
    x, k, b, r, ps, pb = _case(cin, cout, d, h, w, res, pre)
    got = conv3_planes(x, k, b, r, ps, pb, act=act, pad_mode=pad_mode,
                       pre_relu=pre, interpret=True)
    want = conv3_planes_xla(x, k, b, r, ps, pb, act=act, pad_mode=pad_mode,
                            pre_relu=pre)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_conv3p_full_lane_width():
    """W = 128 exercises the lane-roll boundary masks at full tile width."""
    x, k, b, r, ps, pb = _case(1, 2, 4, 8, 128)
    got = conv3_planes(x, k, b, act="relu", interpret=True)
    want = conv3_planes_xla(x, k, b, act="relu")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_conv3p_depth_not_divisible_by_big_tile():
    """d=12 forces the adaptive depth-tile fallback (td halving)."""
    x, k, b, r, ps, pb = _case(2, 2, 12, 8, 16)
    got = conv3_planes(x, k, b, interpret=True)
    want = conv3_planes_xla(x, k, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )
