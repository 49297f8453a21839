"""Fused VMEM attention (`ops/pallas/attn_vmem.py`) vs the XLA
formulation it replaces in the Sformer's grouped patch attention
(`models/sformer.py::_attend`; reference semantics
`/root/reference/models/NlosPoseSformer.py:174-183`).

Interpret mode (CPU); the on-chip lowering is validated by the round-5
TPU job queue before the route defaults on real hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.ops.pallas.attn_vmem import (
    _attend_fused_impl,
    attend_fused,
    attend_fused_supported,
    attend_ref,
)

# (B, Lq, Lk, dh): ragged Lk (lane-pad + mask path), multi-block Lq,
# Lq == the sformer's group size with joint tokens prepended (1048), and
# a small-Lq case (the joint-token read at reduced scale).
SHAPES = [
    (3, 64, 80, 32),      # ragged Lk < 128
    (2, 256, 131, 32),    # ragged Lk > 128, multi q-block at tiny VMEM
    (1, 128, 1048, 32),   # realdata group shape (scaled-down B)
    (2, 24, 640, 64),     # small Lq, wider head
]


@pytest.mark.parametrize("shape", SHAPES)
def test_attend_fused_matches_ref_f32(shape):
    b, lq, lk, dh = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, lq, dh).astype(np.float32)) * dh ** -0.5
    k = jnp.asarray(rng.randn(b, lk, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, lk, dh).astype(np.float32))
    ref = np.asarray(attend_ref(q, k, v))
    got = np.asarray(_attend_fused_impl(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_attend_fused_matches_ref_bf16():
    b, lq, lk, dh = 2, 64, 200, 32
    rng = np.random.RandomState(1)
    q = (jnp.asarray(rng.randn(b, lq, dh).astype(np.float32)) * dh ** -0.5)
    k = jnp.asarray(rng.randn(b, lk, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, lk, dh).astype(np.float32))
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    ref = np.asarray(attend_ref(qb, kb, vb)).astype(np.float32)
    got = np.asarray(
        _attend_fused_impl(qb, kb, vb, interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_attend_fused_extreme_logits():
    """Rows whose max logit is large/negative: the in-kernel max-subtract
    must keep exp() finite exactly like jax.nn.softmax."""
    b, lq, lk, dh = 1, 8, 136, 8
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(b, lq, dh).astype(np.float32)) * 50.0
    k = jnp.asarray(rng.randn(b, lk, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, lk, dh).astype(np.float32))
    ref = np.asarray(attend_ref(q, k, v))
    got = np.asarray(_attend_fused_impl(q, k, v, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_attend_fused_grads_match_ref(monkeypatch):
    """custom_vjp backward (XLA attention gradient) == autodiff of the
    reference formulation."""
    import hiddenpose_tpu.ops.pallas.attn_vmem as m

    monkeypatch.setattr(m, "on_tpu_default_device", lambda: False)
    b, lq, lk, dh = 2, 16, 40, 16
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, lq, dh).astype(np.float32)) * dh ** -0.5
    k = jnp.asarray(rng.randn(b, lk, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, lk, dh).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(attend_fused(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attend_ref(q, k, v) ** 2)

    gf = jax.grad(loss_fused, (0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-5)


def test_supported_predicate():
    assert attend_fused_supported((8, 1024, 32), (8, 1048, 32))
    assert not attend_fused_supported((8, 24, 32), (8, 131096, 32))  # joints
    assert not attend_fused_supported((8, 100, 32), (8, 1048, 32))  # Lq % 8
    assert not attend_fused_supported((8, 64, 20), (8, 512, 20))    # dh % 8


def test_sformer_routes_through_fused(monkeypatch):
    """HP_SFORMER_ATTN=fused (interpret) vs off: same NlosPoseSformer
    outputs — proves the routed seam carries the grouped patch attention
    correctly (joint-token path stays XLA either way)."""
    from hiddenpose_tpu.models.sformer import NlosPoseSformer

    model = NlosPoseSformer(
        dim=32, num_frames=2, num_joints=4, image_size=16, patch_size=4,
        channels=1, depth=1, heads=2, dim_head=8, out_dim=16,
    )
    video = jnp.asarray(
        np.random.RandomState(4).rand(1, 2, 1, 16, 16).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), video)

    monkeypatch.setenv("HP_SFORMER_ATTN", "fused")
    got = model.apply(params, video)
    monkeypatch.setenv("HP_SFORMER_ATTN", "off")
    ref = model.apply(params, video)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6
    )