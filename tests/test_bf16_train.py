"""Mixed-precision (bf16) training-path regression tests.

Round-3 finding: this JAX version's conv transpose rule rejects mixed
operand dtypes, so any ``lax.conv_general_dilated`` with bf16 operands and
``preferred_element_type=float32`` crashes under ``jax.grad`` (the f32
cotangent is fed back into a conv against the bf16 kernel).  The training
path must therefore route every such conv through
``ops.conv_acc.conv_acc32``.  Reference has no bf16 mode (fp32-only torch);
these tests guard the TPU-native mixed-precision extension.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hiddenpose_tpu.config import default_config
from hiddenpose_tpu.models.nlospose import build_nlospose
from hiddenpose_tpu.ops.conv_acc import conv_acc32


def test_conv_acc32_matches_f32_and_differentiates():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    dn = ("NHWC", "HWIO", "NHWC")

    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    out = conv_acc32(x, k, (1, 1), "SAME", dn)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    # bf16 operands: forward returns f32, grad does not crash and the
    # gradient matches the f32 gradient to bf16 rounding.
    def loss(xx, kk):
        return conv_acc32(xx, kk, (1, 1), "SAME", dn).sum()

    g32 = jax.grad(loss, argnums=(0, 1))(x, k)
    xb, kb = x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
    assert conv_acc32(xb, kb, (1, 1), "SAME", dn).dtype == jnp.float32
    gb = jax.grad(loss, argnums=(0, 1))(xb, kb)
    for a, b in zip(g32, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b, np.float32), rtol=0.1, atol=0.1
        )


def test_bf16_full_model_grads_trace():
    """The end-to-end mixed-precision backward must trace (the 128^3 TPU
    run crashed at StemS2D's conv transpose before the conv_acc32 fix);
    eval_shape exercises every dtype rule without compiling."""
    cfg = default_config().tiny().with_bf16()
    model, lct = build_nlospose(cfg.model)
    size = cfg.model.grid_dim
    meas = jnp.zeros((1, 1, size, size, size), jnp.float32)
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(0), meas)

    def loss_fn(params, m):
        (hm, refine), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            m, lct, train=True, mutable=["batch_stats"],
        )
        return (jnp.sum(hm.astype(jnp.float32) ** 2)
                + jnp.sum(refine.astype(jnp.float32) ** 2))

    grads = jax.eval_shape(jax.grad(loss_fn), variables["params"], meas)
    leaves = jax.tree.leaves(grads)
    assert leaves, "no grad leaves"
    # Params stay f32 (mixed precision keeps the master copy in f32).
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)


@pytest.mark.slow
def test_bf16_tiny_train_step_finite():
    """One real optimizer step in bf16 produces finite loss and grads."""
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState
    from hiddenpose_tpu.train.step import make_train_step

    cfg = default_config().tiny(8).with_bf16()
    model, lct = build_nlospose(cfg.model)
    size = cfg.model.grid_dim
    rng = np.random.RandomState(0)
    meas = jnp.asarray(rng.rand(2, 1, size, size, size).astype(np.float32))
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(410), meas[:1])
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    hm = cfg.model.heatmap_size[0]
    batch = {
        "meas": meas,
        "vol": jnp.asarray(rng.rand(2, 1, size, size, size).astype(np.float32)),
        "joints": jnp.asarray((rng.rand(2, 72) * hm).astype(np.float32)),
        "joints_vis": jnp.ones((2, 72), jnp.float32),
    }
    step_fn = make_train_step(model, donate=False)
    state2, metrics = step_fn(state, batch, lct)
    assert np.isfinite(float(metrics["loss"]))
