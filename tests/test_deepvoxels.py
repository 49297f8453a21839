"""DeepVoxels composite (reference `models/feature.py:47-139`) — shape and
semantics tests (VERDICT round-1 missing #3)."""

import numpy as np

import jax
import jax.numpy as jnp

from hiddenpose_tpu.models.deepvoxels import (
    build_deepvoxels,
    deepvoxels_noise,
)

SIZE = 16  # tiny grid: T=16, HW=16 (pre-downsample)


def _model_and_input(basedim=2, channels=1, batch=2):
    model, lct = build_deepvoxels(
        basedim=basedim, image_size=SIZE, time_size=SIZE,
        bin_len=0.01 * (512 // SIZE),
    )
    x = jnp.asarray(
        np.random.RandomState(410)
        .rand(batch, channels, SIZE, SIZE, SIZE)
        .astype(np.float32)
    )
    return model, lct, x


def test_deepvoxels_shapes_and_range():
    model, lct, x = _model_and_input()
    variables = model.init(jax.random.PRNGKey(0), x, lct)
    out = model.apply(variables, x, lct)

    # Transient2volumn halves every axis and emits basedim + C channels
    # (concat branch, `customer_layers_3.py:53-57`); z then crops to
    # z*100//128 (`feature.py:128-132`).
    t_half = SIZE // 2
    z_crop = t_half * 100 // 128
    assert out.shape == (2, 2 + 1, z_crop, SIZE // 2, SIZE // 2)

    # ReLU -> normalize -> x1e5: output in [0, 1e5], max == 1e5 per (b, c)
    # up to the normalize epsilon.
    o = np.asarray(out)
    assert o.min() >= 0.0
    assert o.max() <= 1.0e5 + 1e-2
    np.testing.assert_allclose(
        o.reshape(2, 3, -1).max(axis=2), 1.0e5, rtol=1e-4
    )


def test_deepvoxels_jits_and_differentiates():
    model, lct, x = _model_and_input(batch=1)
    variables = model.init(jax.random.PRNGKey(0), x, lct)

    def loss(params):
        out = model.apply({"params": params}, x, lct)
        return jnp.mean(out**2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    finite = all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))
    assert finite
    # The learned branch must receive gradient through the LCT.
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert gnorm > 0.0


def test_deepvoxels_noise_callable():
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((2, 1, 4, 4, 4))
    y = deepvoxels_noise(rng, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())
