"""Shape/parity unit tests for the NN stack on a tiny config.

Mirrors the reference's inline smoke blocks (`models/NlosPose.py:62-66`,
`models/posenet3d_50.py:321-335`, `unet/unet3d.py:121-131`) as assertions.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

import jax
import jax.numpy as jnp

from hiddenpose_tpu.config import default_config
from hiddenpose_tpu.models.blocks import (
    FeatureExtraction,
    ResConv3D,
    corner_mask_init,
    resize_trilinear,
)
from hiddenpose_tpu.models.nlospose import build_nlospose
from hiddenpose_tpu.models.posenet3d import PoseNet3D
from hiddenpose_tpu.models.unet3d import UNet3d

SIZE = 16
CFG = default_config().tiny(SIZE)


def test_resconv3d_shape_preserving():
    m = ResConv3D(features=2)
    x = jnp.ones((1, 6, 6, 6, 2))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape


def test_corner_mask_init_values():
    # models/feature_extraction.py:141-145: ones in [1:,1:,1:], sum-normalised.
    w = np.asarray(corner_mask_init(None, (3, 3, 3, 1, 1)))
    assert w[0].sum() == 0 and w[:, 0].sum() == 0 and w[:, :, 0].sum() == 0
    np.testing.assert_allclose(w[1:, 1:, 1:], 1.0 / 8.0)
    np.testing.assert_allclose(w.sum(), 1.0)


def test_feature_extraction_shapes_and_fixed_branch():
    m = FeatureExtraction(basedim=1, stride=1)
    x = jnp.ones((2, 8, 8, 8, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 8, 8, 1)

    m2 = FeatureExtraction(basedim=1, stride=2)
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(p2, x).shape == (2, 4, 4, 4, 1)


def test_resize_trilinear_align_corners():
    # 1D ramp doubles exactly under align_corners semantics.
    x = jnp.arange(4.0).reshape(1, 4, 1, 1, 1)
    x = jnp.broadcast_to(x, (1, 4, 2, 2, 1))
    y = resize_trilinear(x, (7, 2, 2))
    np.testing.assert_allclose(
        np.asarray(y[0, :, 0, 0, 0]), np.linspace(0, 3, 7), atol=1e-6
    )


def test_unet3d_shapes():
    m = UNet3d(in_channels=1, n_channels=4)
    x = jnp.ones((1, SIZE, SIZE, SIZE, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape


@pytest.fixture(scope="module")
def posenet():
    m = PoseNet3D(num_joints=24)
    x = jnp.ones((1, SIZE, SIZE, SIZE, 1))
    variables = jax.jit(lambda r, x: m.init(r, x, train=False))(
        jax.random.PRNGKey(0), x
    )
    return m, variables, x


@pytest.fixture(scope="module")
def nlospose():
    model, lct = build_nlospose(CFG.model)
    meas = jnp.ones((1, 1, SIZE, SIZE, SIZE), jnp.float32)
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(0), meas)
    return model, lct, variables, meas


def test_posenet3d_50_halves_resolution(posenet):
    # 128^3 -> 64^3 in the reference; tiny: SIZE^3 -> (SIZE/2)^3, 24 joints.
    m, variables, x = posenet
    y = jax.jit(lambda v, x: m.apply(v, x, train=False))(variables, x)
    assert y.shape == (1, SIZE // 2, SIZE // 2, SIZE // 2, 24)
    assert "batch_stats" in variables


def test_posenet3d_param_count_resnet50_scale(posenet):
    # Bottleneck [3,4,6,3] @ widths [64..512] + head: 3D kernels make it
    # ~3x the 2D ResNet-50 param count, input-size-agnostic.
    _, variables, _ = posenet
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 80e6 < n < 160e6


def test_nlospose_end_to_end_tiny(nlospose):
    model, lct, variables, meas = nlospose
    heatmaps, refine = jax.jit(
        lambda v, m: model.apply(v, m, lct, train=False)
    )(variables, meas)
    h = SIZE // 2
    assert heatmaps.shape == (1, 24, h, h, h)
    assert refine.shape == (1, 1, SIZE, SIZE, SIZE)
    assert bool(jnp.isfinite(heatmaps).all())
    assert bool(jnp.isfinite(refine).all())


def test_nlospose_jit_and_grad(nlospose):
    model, lct, variables, meas = nlospose

    @jax.jit
    def loss_fn(params, meas):
        hm, refine = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            meas, lct, train=False,
        )
        return (hm ** 2).mean() + (refine ** 2).mean()

    g = jax.grad(loss_fn)(variables["params"], meas)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # Gradients must reach through the LCT into the feature extractor.
    fe = g["feature_extraction"]
    assert any(float(jnp.abs(l).max()) > 0 for l in jax.tree.leaves(fe))
