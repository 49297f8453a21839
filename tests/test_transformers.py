"""Transformer-family tests: rotary tables, NlosPoseSformer, TimeSformer,
TokenPose — shapes, determinism, and rotary math identities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.models.rotary import (
    apply_rotary,
    rotary_1d,
    rotary_axial,
    rotate_every_two,
)
from hiddenpose_tpu.models.sformer import NlosPoseSformer
from hiddenpose_tpu.models.timesformer import TimeSformer, token_shift
from hiddenpose_tpu.models.tokenpose import TokenPose, sine_position_embedding


def test_rotate_every_two():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    np.testing.assert_allclose(
        np.asarray(rotate_every_two(x)), [[-2.0, 1.0, -4.0, 3.0]]
    )


def test_rotary_1d_shapes_and_norm_preservation():
    sin, cos = rotary_1d(7, 16)
    assert sin.shape == (1, 7, 16) and cos.shape == (1, 7, 16)
    # Rotation preserves per-pair norms.
    q = jnp.asarray(np.random.RandomState(0).randn(1, 7, 16), jnp.float32)
    k = jnp.asarray(np.random.RandomState(1).randn(1, 7, 16), jnp.float32)
    q2, k2 = apply_rotary(q, k, (sin, cos))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q2), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5,
    )


def test_rotary_relative_position_property():
    # <rot(q, i), rot(k, j)> depends only on (i - j) for pure rotary dims.
    dim = 8
    sin, cos = rotary_1d(10, dim)
    rng = np.random.RandomState(2)
    q = jnp.asarray(np.tile(rng.randn(1, 1, dim), (1, 10, 1)), jnp.float32)
    k = jnp.asarray(np.tile(rng.randn(1, 1, dim), (1, 10, 1)), jnp.float32)
    qr, kr = apply_rotary(q, k, (sin, cos))
    qr, kr = np.asarray(qr)[0], np.asarray(kr)[0]
    d1 = float(qr[3] @ kr[1])
    d2 = float(qr[7] @ kr[5])
    np.testing.assert_allclose(d1, d2, rtol=1e-4)


def test_rotary_axial_shapes():
    # 2 axes * (dim//4) scales, each duplicated pairwise -> dim features.
    sin, cos = rotary_axial(4, 6, 32)
    assert sin.shape == (1, 24, 32)


def test_sine_position_embedding_shape():
    pos = sine_position_embedding(8, 8, 192)
    assert pos.shape == (1, 64, 192)
    assert np.isfinite(pos).all()


def test_token_shift_identity_channels():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1 + 6, 9), jnp.float32)
    y = token_shift(x, f=3, n=2, num_summary=1)
    assert y.shape == x.shape
    # Last third of channels is unshifted; summary token untouched.
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]))
    np.testing.assert_allclose(
        np.asarray(y[:, 1:, 6:]), np.asarray(x[:, 1:, 6:])
    )


@pytest.mark.parametrize("use_time_attn", [False, True])
def test_sformer_forward_shapes(use_time_attn):
    m = NlosPoseSformer(
        dim=32, num_frames=4, num_joints=24, image_size=16, patch_size=4,
        channels=1, depth=2, heads=2, dim_head=8, out_dim=16,
        use_time_attn=use_time_attn,
    )
    video = jnp.ones((2, 4, 1, 16, 16))
    params = m.init(jax.random.PRNGKey(0), video)
    out = m.apply(params, video)
    assert out.shape == (2, 24, 4, 4)
    assert bool(jnp.isfinite(out).all())


def test_sformer_learnable_pos_variant():
    m = NlosPoseSformer(
        dim=32, num_frames=2, num_joints=24, image_size=8, patch_size=4,
        channels=1, depth=1, heads=2, dim_head=8, out_dim=16,
        rotary_emb=False,
    )
    video = jnp.ones((1, 2, 1, 8, 8))
    params = m.init(jax.random.PRNGKey(0), video)
    assert "pos_emb" in params["params"]
    assert m.apply(params, video).shape == (1, 24, 4, 4)


def test_timesformer_forward():
    m = TimeSformer(
        dim=32, num_frames=3, num_classes=72, image_size=16, patch_size=4,
        channels=1, depth=2, heads=2, dim_head=8, shift_tokens=True,
    )
    video = jnp.ones((2, 3, 1, 16, 16))
    params = m.init(jax.random.PRNGKey(0), video)
    out = m.apply(params, video)
    assert out.shape == (2, 72)
    assert bool(jnp.isfinite(out).all())


def test_tokenpose_forward():
    m = TokenPose(
        feature_size=(16, 16), patch_size=(4, 4), num_keypoints=24,
        dim=32, channels=8, depth=1, heads=2, mlp_ratio=2,
        hidden_heatmap_dim=384, heatmap_size=(16, 16),
    )
    feat = jnp.ones((2, 8, 16, 16))
    params = m.init(jax.random.PRNGKey(0), feat)
    out = m.apply(params, feat)
    assert out.shape == (2, 24, 16, 16)
    assert bool(jnp.isfinite(out).all())
