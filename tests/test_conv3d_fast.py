"""Equivalence tests for the MXU-friendly conv reformulations
(`ops/conv3d_fast.py`) and their routing in PoseNet3D's blocks."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.ops.conv3d_fast import (
    conv1x1x1_mm,
    conv3x3x3_d2d,
    conv_transpose4_s2_mm,
)

rng = np.random.RandomState(7)


def _native(x, k, stride):
    p = k.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, k, (stride,) * 3, [(p, p)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize("stride", [1, 2])
def test_conv1x1_mm_matches_native(stride):
    x = jnp.asarray(rng.rand(2, 6, 6, 6, 16).astype(np.float32))
    k = jnp.asarray(rng.rand(1, 1, 1, 16, 8).astype(np.float32))
    np.testing.assert_allclose(
        conv1x1x1_mm(x, k, stride), _native(x, k, stride), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("stride", [1, 2])
def test_conv3_d2d_matches_native(stride):
    x = jnp.asarray(rng.rand(2, 6, 6, 6, 8).astype(np.float32))
    k = jnp.asarray(rng.rand(3, 3, 3, 8, 4).astype(np.float32))
    np.testing.assert_allclose(
        conv3x3x3_d2d(x, k, stride), _native(x, k, stride), rtol=1e-5, atol=1e-5
    )


def test_deconv_mm_matches_flax():
    from flax import linen as nn

    x = jnp.asarray(rng.rand(2, 5, 6, 7, 8).astype(np.float32))
    k = jnp.asarray((rng.rand(4, 4, 4, 8, 4) - 0.5).astype(np.float32))
    ref = nn.ConvTranspose(
        4, (4, 4, 4), strides=(2, 2, 2), padding="SAME", use_bias=False
    ).apply({"params": {"kernel": k}}, x)
    np.testing.assert_allclose(
        conv_transpose4_s2_mm(x, k), ref, rtol=1e-5, atol=1e-5
    )


def test_gradients_match_native():
    x = jnp.asarray(rng.rand(1, 5, 5, 5, 8).astype(np.float32))
    k1 = jnp.asarray(rng.rand(1, 1, 1, 8, 4).astype(np.float32))
    k3 = jnp.asarray(rng.rand(3, 3, 3, 8, 4).astype(np.float32))

    for fast, k, stride in (
        (conv1x1x1_mm, k1, 1),
        (conv1x1x1_mm, k1, 2),
        (conv3x3x3_d2d, k3, 1),
        (conv3x3x3_d2d, k3, 2),
    ):
        gf = jax.grad(lambda x, k: jnp.sum(fast(x, k, stride) ** 2), (0, 1))
        gn = jax.grad(lambda x, k: jnp.sum(_native(x, k, stride) ** 2), (0, 1))
        for a, b in zip(gf(x, k), gn(x, k)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_deconv_gradients_match_flax():
    from flax import linen as nn

    x = jnp.asarray(rng.rand(1, 4, 4, 4, 8).astype(np.float32))
    k = jnp.asarray((rng.rand(4, 4, 4, 8, 4) - 0.5).astype(np.float32))
    mod = nn.ConvTranspose(
        4, (4, 4, 4), strides=(2, 2, 2), padding="SAME", use_bias=False
    )
    gf = jax.grad(
        lambda x, k: jnp.sum(conv_transpose4_s2_mm(x, k) ** 2), (0, 1)
    )
    gn = jax.grad(
        lambda x, k: jnp.sum(
            mod.apply({"params": {"kernel": k}}, x) ** 2
        ),
        (0, 1),
    )
    for a, b in zip(gf(x, k), gn(x, k)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_posenet_block_routing_is_equivalent():
    """Bottleneck + DeconvHead forward/grads identical with routing on/off."""
    from hiddenpose_tpu.models.posenet3d import Bottleneck, DeconvHead

    x = jnp.asarray(rng.rand(1, 6, 6, 6, 16).astype(np.float32))
    blk = Bottleneck(planes=4, stride=2, use_projection=True, train=False)
    old = os.environ.get("HP_FASTCONV")
    try:
        os.environ["HP_FASTCONV"] = "mm,deconv"
        v = blk.init(jax.random.PRNGKey(1), x)
        y_fast = blk.apply(v, x)
        os.environ["HP_FASTCONV"] = ""
        y_native = blk.apply(v, x)
        np.testing.assert_allclose(y_fast, y_native, rtol=1e-5, atol=1e-5)

        head = DeconvHead(num_joints=3)
        h = jnp.asarray(rng.rand(1, 4, 4, 4, 32).astype(np.float32))
        os.environ["HP_FASTCONV"] = "mm,deconv"
        hv = head.init(jax.random.PRNGKey(2), h)
        os.environ["HP_FASTCONV"] = ""
        ref = head.apply(hv, h)
        os.environ["HP_FASTCONV"] = "mm,deconv"
        np.testing.assert_allclose(
            head.apply(hv, h), ref, rtol=1e-5, atol=1e-5
        )
    finally:
        if old is None:
            os.environ.pop("HP_FASTCONV", None)
        else:
            os.environ["HP_FASTCONV"] = old


def test_deconv_custom_vjp_matches_flax():
    """deconv4_s2_diff (native fwd, phase-matmul dk, strided-conv dx) ==
    flax ConvTranspose gradients."""
    from hiddenpose_tpu.ops.conv3d_fast import (
        _deconv_fwd_impl,
        deconv4_s2_diff,
    )

    x = jnp.asarray(rng.rand(2, 4, 6, 5, 8).astype(np.float32))
    k = jnp.asarray((rng.rand(4, 4, 4, 8, 4) - 0.5).astype(np.float32))
    ct = jnp.asarray(rng.rand(2, 8, 12, 10, 4).astype(np.float32))
    y1, p1 = jax.vjp(deconv4_s2_diff, x, k)
    y0, p0 = jax.vjp(_deconv_fwd_impl, x, k)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)
    for a, b in zip(p1(ct), p0(ct)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
        )


def test_deconv_bwd_bf16_cast_path(monkeypatch):
    """deconv4_s2_diff backward with the TPU bf16-operand cast forced on
    CPU (HP_BWD_CAST=bf16) stays within mixed-precision tolerance of the
    exact f32 gradients (ADVICE r3)."""
    from hiddenpose_tpu.ops.conv3d_fast import (
        _deconv_fwd_impl,
        deconv4_s2_diff,
    )

    x = jnp.asarray(rng.rand(2, 4, 6, 5, 8).astype(np.float32))
    k = jnp.asarray((rng.rand(4, 4, 4, 8, 4) - 0.5).astype(np.float32))
    ct = jnp.asarray(rng.rand(2, 8, 12, 10, 4).astype(np.float32))
    y0, p0 = jax.vjp(_deconv_fwd_impl, x, k)
    monkeypatch.setenv("HP_BWD_CAST", "bf16")
    y1, p1 = jax.vjp(deconv4_s2_diff, x, k)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)
    for a, b in zip(p1(ct), p0(ct)):
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=2e-2, atol=2e-2 * np.abs(b).max()
        )


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("shape", [(2, 6, 6, 6, 8), (1, 5, 7, 6, 8)])
def test_conv3_taps_mm_matches_native(shape, stride):
    """27-tap matmul form (the 'island' route's conv-free s2 lowering)."""
    from hiddenpose_tpu.ops.conv3d_fast import conv3x3x3_taps_mm

    x = jnp.asarray(rng.rand(*shape).astype(np.float32))
    k = jnp.asarray(rng.rand(3, 3, 3, 8, 4).astype(np.float32))
    np.testing.assert_allclose(
        conv3x3x3_taps_mm(x, k, stride), _native(x, k, stride),
        rtol=1e-5, atol=1e-5,
    )


def test_taps_mm_gradients_match_native():
    from hiddenpose_tpu.ops.conv3d_fast import conv3x3x3_taps_mm

    x = jnp.asarray(rng.rand(1, 5, 5, 5, 8).astype(np.float32))
    k = jnp.asarray(rng.rand(3, 3, 3, 8, 4).astype(np.float32))
    for stride in (1, 2):
        gf = jax.grad(
            lambda x, k: jnp.sum(conv3x3x3_taps_mm(x, k, stride) ** 2), (0, 1)
        )
        gn = jax.grad(
            lambda x, k: jnp.sum(_native(x, k, stride) ** 2), (0, 1)
        )
        for a, b in zip(gf(x, k), gn(x, k)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_island_route_matches_base(monkeypatch):
    """HP_CONV3MXU_ROUTE=island: the conv-free forward (Pallas conv2 +
    taps-mm s2 + mm 1x1s + phase-mm deconvs + mm final) matches the base
    XLA program on a stride-2 projection Bottleneck, a stride-1 (MXU-
    routed, interpret-mode) Bottleneck, and the DeconvHead."""
    import hiddenpose_tpu.ops.pallas.conv3mxu as m
    from hiddenpose_tpu.models.posenet3d import Bottleneck, DeconvHead

    monkeypatch.setenv("HP_CONV3MXU_DT", "f32")
    monkeypatch.setenv("HP_CONV3MXU_ROUTE", "island")

    x = jnp.asarray(rng.rand(1, 4, 8, 16, 256).astype(np.float32))
    for stride, proj in ((2, True), (1, False)):
        blk = Bottleneck(
            planes=64, stride=stride, use_projection=proj, train=False
        )
        v = blk.init(jax.random.PRNGKey(1), x)
        monkeypatch.setattr(m, "conv3mxu_enabled", lambda: True)
        y_island = blk.apply(v, x)
        monkeypatch.setattr(m, "conv3mxu_enabled", lambda: False)
        y_base = blk.apply(v, x)
        np.testing.assert_allclose(
            y_island, y_base, rtol=2e-5, atol=2e-4
        )

    head = DeconvHead(num_joints=3)
    h = jnp.asarray(rng.rand(1, 4, 4, 4, 32).astype(np.float32))
    v = head.init(jax.random.PRNGKey(2), h)
    monkeypatch.setattr(m, "conv3mxu_enabled", lambda: True)
    y_island = head.apply(v, h)
    monkeypatch.setattr(m, "conv3mxu_enabled", lambda: False)
    y_base = head.apply(v, h)
    np.testing.assert_allclose(y_island, y_base, rtol=1e-5, atol=1e-5)
