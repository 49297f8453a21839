"""Space-to-depth conv lowering: algebraic-equivalence tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.models.blocks import max_pool3d
from hiddenpose_tpu.ops.space_to_depth import (
    conv3d_s2d,
    depth_to_space_3d,
    make_s2d_kernel,
    phase_maxpool_k3s2,
    space_to_depth_3d,
)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space_3d(space_to_depth_3d(x))), np.asarray(x)
    )


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("cin", [1, 2])
def test_conv3d_s2d_matches_native(k, cin):
    rng = np.random.RandomState(k)
    x = jnp.asarray(rng.randn(2, 16, 16, 16, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, k, cin, 4).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = conv3d_s2d(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_phase_maxpool_matches_native():
    rng = np.random.RandomState(1)
    full = jnp.asarray(rng.randn(2, 16, 16, 16, 4).astype(np.float32))
    want = max_pool3d(full, 3, 2, pad=1)
    # s2d-space layout of the same full-resolution tensor.
    y2 = space_to_depth_3d(full)
    got = phase_maxpool_k3s2(y2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_stem_s2d_matches_native_stem():
    """StemS2D == conv7 SAME + BN(eval) + relu + maxpool(3,2,1) with the
    same kernel."""
    from hiddenpose_tpu.models.posenet3d import StemS2D

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 1).astype(np.float32))
    stem = StemS2D(features=8, train=False)
    variables = stem.init(jax.random.PRNGKey(0), x)
    got = stem.apply(variables, x)

    kernel = variables["params"]["kernel"]
    conv = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    # fresh BN stats: mean 0, var 1, scale 1, bias 0 -> conv/sqrt(1+eps)
    bn = conv / np.sqrt(1.0 + 1e-5)
    want = max_pool3d(jax.nn.relu(bn), 3, 2, pad=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_stem_conv_custom_vjp_matches_native():
    """conv_s2d_stem_diff (custom backward: dx flipped-kernel conv, dk
    im2col matmul — the 47.7 ms native wgrad fix) == plain conv grads."""
    from hiddenpose_tpu.ops.space_to_depth import (
        _stem_conv_fwd_impl,
        conv_s2d_stem_diff,
    )

    rng = np.random.RandomState(3)
    x2 = jnp.asarray(rng.rand(1, 6, 6, 6, 8).astype(np.float32))
    k2 = jnp.asarray((rng.rand(5, 5, 5, 8, 16) - 0.5).astype(np.float32))
    ct = jnp.asarray(rng.rand(1, 6, 6, 6, 16).astype(np.float32))

    y1, pull1 = jax.vjp(conv_s2d_stem_diff, x2, k2)
    y0, pull0 = jax.vjp(_stem_conv_fwd_impl, x2, k2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)
    for a, b in zip(pull1(ct), pull0(ct)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_stem_raw_diff_matches_s2d_diff():
    """conv_stem_raw_diff (Pallas train-forward from the raw volume) ==
    conv_s2d_stem_diff on the s2d input: same forward (f32 reassociation
    only) and identical gradients (shared backward)."""
    from hiddenpose_tpu.ops.space_to_depth import (
        conv_s2d_stem_diff,
        conv_stem_raw_diff,
        depth_to_space_3d,
    )

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(1, 8, 8, 128, 1).astype(np.float32))
    k2 = jnp.asarray((rng.rand(5, 5, 5, 8, 16) - 0.5).astype(np.float32))
    ct = jnp.asarray(rng.rand(1, 4, 4, 64, 16).astype(np.float32))
    y1, p1 = jax.vjp(conv_stem_raw_diff, x, k2)
    y0, p0 = jax.vjp(conv_s2d_stem_diff, space_to_depth_3d(x), k2)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-5
    )
    dx1, dk1 = p1(ct)
    dx0, dk0 = p0(ct)
    np.testing.assert_array_equal(np.asarray(dk1), np.asarray(dk0))
    np.testing.assert_array_equal(
        np.asarray(dx1), np.asarray(depth_to_space_3d(dx0))
    )


def test_stem_conv_bwd_bf16_cast_path(monkeypatch):
    """Force the TPU bf16-operand backward (HP_BWD_CAST=bf16) on CPU and
    check dx/dk against the exact f32 grads — the reduced-precision matmul
    path is otherwise never exercised by CI (ADVICE r3)."""
    from hiddenpose_tpu.ops.space_to_depth import (
        _stem_conv_fwd_impl,
        conv_s2d_stem_diff,
    )

    rng = np.random.RandomState(13)
    x2 = jnp.asarray(rng.rand(1, 6, 6, 6, 8).astype(np.float32))
    k2 = jnp.asarray((rng.rand(5, 5, 5, 8, 16) - 0.5).astype(np.float32))
    ct = jnp.asarray(rng.rand(1, 6, 6, 6, 16).astype(np.float32))

    y0, pull0 = jax.vjp(_stem_conv_fwd_impl, x2, k2)
    monkeypatch.setenv("HP_BWD_CAST", "bf16")
    y1, pull1 = jax.vjp(conv_s2d_stem_diff, x2, k2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)
    for a, b in zip(pull1(ct), pull0(ct)):
        b = np.asarray(b)
        # bf16 operands, f32 accumulation: ~0.4% relative on these sums.
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=2e-2, atol=2e-2 * np.abs(b).max()
        )
