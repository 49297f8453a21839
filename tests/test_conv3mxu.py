"""Equivalence tests for the MXU tap-pack 3^3 convolution kernel
(`ops/pallas/conv3mxu.py`) against the XLA conv, fwd + custom VJP.

CPU CI runs the kernel in interpreter mode (exact f32); the on-chip
validation job re-runs the same comparisons on the TPU
(scripts history / tpu_jobs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hiddenpose_tpu.ops.pallas.conv3mxu import (
    conv3_dk_mm,
    conv3_mxu,
    conv3_mxu_diff,
    conv3mxu_supported,
)

SHAPES = [
    # (b, d, h, w, cin, cout) — scaled-down analogues of L1/L2/L3.
    (1, 4, 8, 16, 64, 64),
    (2, 2, 4, 8, 128, 64),
    (1, 2, 8, 32, 64, 128),
    (1, 3, 4, 16, 256, 64),
]


def _xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype)


def _rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(shape):
    b, d, h, w, cin, cout = shape
    x = _rand((b, d, h, w, cin))
    k = _rand((3, 3, 3, cin, cout), 1) * 0.1
    got = conv3_mxu(x, k, interpret=True, compute_dtype="f32")
    want = _xla_conv(x, k)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_forward_bf16_default_tolerance(shape):
    """The DEFAULT compute path (bf16 operands, f32 accumulation — what
    runs on the chip AND what XLA's own conv emitter does for f32 inputs
    under default precision) stays within bf16 rounding of the exact
    result.  Keeps the reduced-precision path visible to CPU CI."""
    b, d, h, w, cin, cout = shape
    x = _rand((b, d, h, w, cin))
    k = _rand((3, 3, 3, cin, cout), 1) * 0.1
    got = conv3_mxu(x, k, interpret=True)  # env default: bf16
    want = _xla_conv(x, k)
    # bf16 has ~8 mantissa bits; the contraction accumulates in f32, so
    # error scales with the OUTPUT magnitude, not per-element (elements
    # near zero by cancellation see large relative error — bound the
    # error relative to the output scale).
    err = jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-8)
    assert err < 5e-3, err


def test_supported_gate():
    assert conv3mxu_supported((2, 64, 64, 64, 64), 64, 64)
    assert conv3mxu_supported((2, 32, 32, 32, 128), 128, 128)
    assert conv3mxu_supported((2, 16, 16, 16, 256), 256, 256)
    # c512 (layer 4): the C_out column split (round 5) makes it mechanically
    # eligible, but routing stays gated behind HP_CONV3MXU_C512 until the
    # on-chip composed A/B validates it.
    assert not conv3mxu_supported((2, 8, 8, 8, 512), 512, 512)
    os.environ["HP_CONV3MXU_C512"] = "1"
    try:
        assert conv3mxu_supported((2, 8, 8, 8, 512), 512, 512)
    finally:
        del os.environ["HP_CONV3MXU_C512"]
    assert not conv3mxu_supported((2, 16, 16, 16, 32), 32, 64)
    assert not conv3mxu_supported((2, 16, 16, 12, 64), 64, 64)


def test_forward_c512_cout_split():
    """Layer-4-shaped conv (cin=cout=512 @ 8^3): the packed weight busts
    the per-call VMEM budget whole, so conv3_mxu runs C_out column slices
    and concatenates — numerics must be identical to the unsplit math."""
    b, d, h, w, cin, cout = 1, 4, 8, 8, 512, 512
    x = _rand((b, d, h, w, cin)) * 0.2
    k = _rand((3, 3, 3, cin, cout), 1) * 0.02
    got = conv3_mxu(x, k, interpret=True, compute_dtype="f32")
    want = _xla_conv(x, k)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_grad_c512_cout_split(monkeypatch):
    """dx through the split kernel (the production 'bwd' routing use) on
    the layer-4 shape matches autodiff of the XLA conv."""
    monkeypatch.setenv("HP_CONV3MXU_DT", "f32")
    b, d, h, w, cin, cout = 1, 2, 8, 8, 512, 512
    x = _rand((b, d, h, w, cin)) * 0.2
    k = _rand((3, 3, 3, cin, cout), 1) * 0.02
    dy = _rand((b, d, h, w, cout), 2) * 0.1

    want_dx = jax.grad(lambda x_: (_xla_conv(x_, k) * dy).sum())(x)
    got_dx = jax.grad(lambda x_: (conv3_mxu_diff(x_, k) * dy).sum())(x)
    scale = jnp.abs(want_dx).max() + 1e-8
    assert (jnp.abs(got_dx - want_dx).max() / scale) < 5e-5


def test_dk_matches_autodiff():
    b, d, h, w, cin, cout = 1, 2, 4, 8, 64, 64
    x = _rand((b, d, h, w, cin))
    k = _rand((3, 3, 3, cin, cout), 1) * 0.1
    dy = _rand((b, d, h, w, cout), 2)
    want = jax.grad(lambda k: (_xla_conv(x, k) * dy).sum())(k)
    got = conv3_dk_mm(x, dy)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_fused_epilogue_matches(shape):
    """In-kernel BN-affine + ReLU epilogue == conv -> affine -> relu."""
    b, d, h, w, cin, cout = shape
    x = _rand((b, d, h, w, cin))
    k = _rand((3, 3, 3, cin, cout), 1) * 0.1
    scale = _rand((cout,), 3) * 0.5 + 1.0
    shift = _rand((cout,), 4) * 0.2
    got = conv3_mxu(x, k, scale, shift, relu=True, interpret=True,
                    compute_dtype="f32")
    want = jax.nn.relu(_xla_conv(x, k) * scale + shift)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_bottleneck_fused_infer_matches_plain(monkeypatch):
    """The fused conv2+bn2+relu inference path == the plain flax path,
    with an IDENTICAL param/batch_stats tree (checkpoint compat)."""
    import hiddenpose_tpu.ops.pallas.conv3mxu as m
    from hiddenpose_tpu.models.posenet3d import Bottleneck

    monkeypatch.setenv("HP_CONV3MXU_DT", "f32")
    monkeypatch.setenv("HP_CONV3MXU_ROUTE", "full")

    x = _rand((1, 4, 8, 16, 256))
    model = Bottleneck(planes=64, train=False)

    plain_vars = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setattr(m, "conv3mxu_enabled", lambda: True)
    fused_vars = model.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(fused_vars) == (
        jax.tree_util.tree_structure(plain_vars)
    )
    # Non-trivial running stats so the affine actually does something.
    stats = dict(plain_vars["batch_stats"])
    stats["bn2"] = {
        "mean": _rand((64,), 5) * 0.1,
        "var": jnp.abs(_rand((64,), 6)) + 0.5,
    }
    params = dict(plain_vars["params"])
    varz = {"params": params, "batch_stats": stats}
    y_fused = model.apply(varz, x)
    monkeypatch.setattr(m, "conv3mxu_enabled", lambda: False)
    y_want = model.apply(varz, x)
    np.testing.assert_allclose(y_fused, y_want, rtol=2e-5, atol=2e-4)


def test_vjp_bf16_model_dtype():
    """The custom VJP works with bf16 activations/weights (the bf16 model
    preset routes through it) and stays within bf16 rounding of the f32
    reference gradient."""
    b, d, h, w, cin, cout = 1, 4, 8, 16, 64, 64
    x = _rand((b, d, h, w, cin))
    k = _rand((3, 3, 3, cin, cout), 1) * 0.1
    dy = _rand((b, d, h, w, cout), 2)

    def loss_kern(x, k):
        y = conv3_mxu_diff(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16))
        return (y.astype(jnp.float32) * dy).sum()

    def loss_ref(x, k):
        return (_xla_conv(x, k) * dy).sum()

    got_dx, got_dk = jax.grad(loss_kern, (0, 1))(x, k)
    want_dx, want_dk = jax.grad(loss_ref, (0, 1))(x, k)
    assert got_dx.dtype == x.dtype and got_dk.dtype == k.dtype
    for g, wv in ((got_dx, want_dx), (got_dk, want_dk)):
        err = jnp.abs(g - wv).max() / (jnp.abs(wv).max() + 1e-8)
        assert err < 2e-2, err


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_vjp_matches_autodiff(shape, monkeypatch):
    monkeypatch.setenv("HP_CONV3MXU_DT", "f32")
    b, d, h, w, cin, cout = shape
    x = _rand((b, d, h, w, cin))
    k = _rand((3, 3, 3, cin, cout), 1) * 0.1
    dy = _rand((b, d, h, w, cout), 2)

    def loss_ref(x, k):
        return (_xla_conv(x, k) * dy).sum()

    def loss_kern(x, k):
        return (conv3_mxu_diff(x, k) * dy).sum()

    want_dx, want_dk = jax.grad(loss_ref, (0, 1))(x, k)
    got_dx, got_dk = jax.grad(loss_kern, (0, 1))(x, k)
    np.testing.assert_allclose(got_dx, want_dx, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(got_dk, want_dk, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_bwd_route_matches_autodiff(shape, monkeypatch):
    """'bwd' routing: the primal is bit-exactly the native conv, and the
    Pallas-dx backward matches full autodiff."""
    from hiddenpose_tpu.ops.pallas.conv3mxu import conv3_mxu_bwd_diff

    monkeypatch.setenv("HP_CONV3MXU_DT", "f32")
    b, d, h, w, cin, cout = shape
    x = _rand((b, d, h, w, cin))
    k = _rand((3, 3, 3, cin, cout), 1) * 0.1
    dy = _rand((b, d, h, w, cout), 2)

    y = conv3_mxu_bwd_diff(x, k)
    np.testing.assert_array_equal(
        np.asarray(y),
        np.asarray(jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )),
    )

    def loss_ref(x, k):
        return (_xla_conv(x, k) * dy).sum()

    def loss_kern(x, k):
        return (conv3_mxu_bwd_diff(x, k) * dy).sum()

    want_dx, want_dk = jax.grad(loss_ref, (0, 1))(x, k)
    got_dx, got_dk = jax.grad(loss_kern, (0, 1))(x, k)
    np.testing.assert_allclose(got_dx, want_dx, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(got_dk, want_dk, rtol=2e-5, atol=2e-4)


def test_bottleneck_bwd_route_grads_match(monkeypatch):
    """The production 'bwd' route through a full train-mode Bottleneck:
    the forward is bit-identical to the unrouted block (native primal) and
    the gradients (Pallas dx in the conv2 backward) match full autodiff."""
    import hiddenpose_tpu.ops.pallas.conv3mxu as m
    from hiddenpose_tpu.models.posenet3d import Bottleneck

    monkeypatch.setenv("HP_CONV3MXU_DT", "f32")
    monkeypatch.setenv("HP_CONV3MXU_ROUTE", "bwd")

    x = _rand((1, 4, 8, 16, 256))
    model = Bottleneck(planes=64, train=True)
    varz = model.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        out, _ = model.apply(
            {"params": params, "batch_stats": varz["batch_stats"]}, x,
            mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    monkeypatch.setattr(m, "conv3mxu_enabled", lambda: True)
    assert m.conv3mxu_route() == "bwd"
    y_routed = loss(varz["params"], x)
    g_routed = jax.grad(loss, (0, 1))(varz["params"], x)
    monkeypatch.setattr(m, "conv3mxu_enabled", lambda: False)
    y_base = loss(varz["params"], x)
    g_base = jax.grad(loss, (0, 1))(varz["params"], x)

    np.testing.assert_array_equal(np.asarray(y_routed), np.asarray(y_base))
    for got, want in zip(jax.tree_util.tree_leaves(g_routed),
                         jax.tree_util.tree_leaves(g_base)):
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_quality_mode_compute_dtype(monkeypatch):
    """Ambient high/highest matmul precision flips the kernel's default
    compute dtype to f32 (quality consistency: the kernel must not stay a
    one-pass bf16 island inside a quality-mode program); HP_CONV3MXU_DT
    still wins when pinned."""
    from hiddenpose_tpu.ops.pallas.conv3mxu import resolve_compute_dtype

    monkeypatch.delenv("HP_CONV3MXU_DT", raising=False)
    assert resolve_compute_dtype() == "bf16"
    with jax.default_matmul_precision("highest"):
        assert resolve_compute_dtype() == "f32"
    with jax.default_matmul_precision("high"):
        assert resolve_compute_dtype() == "f32"
    monkeypatch.setenv("HP_CONV3MXU_DT", "bf16")
    with jax.default_matmul_precision("highest"):
        assert resolve_compute_dtype() == "bf16"


def test_quality_mode_bwd_cast(monkeypatch):
    """The stem/deconv custom-VJP operand cast is NOT flipped by ambient
    precision (f32 operands OOM the t128 b2 backward — tpu_jobs/137 B);
    only the explicit HP_BWD_CAST override moves it."""
    from hiddenpose_tpu.ops.conv_acc import bwd_cast_dtype

    monkeypatch.setenv("HP_BWD_CAST", "bf16")
    with jax.default_matmul_precision("highest"):
        assert bwd_cast_dtype(jnp.float32) == jnp.bfloat16
    monkeypatch.setenv("HP_BWD_CAST", "f32")
    assert bwd_cast_dtype(jnp.float32) == jnp.float32
    monkeypatch.delenv("HP_BWD_CAST", raising=False)
    assert bwd_cast_dtype(jnp.bfloat16) == jnp.bfloat16


def test_quality_mode_route_policy(monkeypatch):
    """Under ambient high/highest precision the default route flips to
    'full' (measured composed-train optimum in quality mode, 1.50x over
    all-XLA — tpu_jobs/138); the env override always wins."""
    from hiddenpose_tpu.ops.pallas.conv3mxu import _route_policy

    monkeypatch.delenv("HP_CONV3MXU_ROUTE", raising=False)
    assert _route_policy() == "bwd"
    with jax.default_matmul_precision("highest"):
        assert _route_policy() == "full"
    monkeypatch.setenv("HP_CONV3MXU_ROUTE", "bwd")
    with jax.default_matmul_precision("highest"):
        assert _route_policy() == "bwd"
