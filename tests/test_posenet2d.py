"""2D backbone variant tests: VisibleNet + ResPoseNet2D + NlosPose wiring."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

import jax
import jax.numpy as jnp

from hiddenpose_tpu.config import default_config
from hiddenpose_tpu.models.nlospose import build_nlospose
from hiddenpose_tpu.models.posenet2d import ResPoseNet2D, visible_net

SIZE = 16


def test_visible_net_shapes_and_depth_semantics():
    # A single bright voxel at depth d should appear as top-1 with
    # normalised flipped depth (D-1-d)/(D-1)
    # (models/feature_propagation.py:289-312).
    x = np.zeros((1, 1, 8, 4, 4), np.float32)
    x[0, 0, 2, 1, 1] = 5.0
    out = np.asarray(visible_net(jnp.asarray(x), k=4))
    assert out.shape == (1, 8, 4, 4)  # 2 * C * k channels
    # top-1 value channel peaks at (1,1); its depth channel holds (7-2)/7.
    np.testing.assert_allclose(out[0, 4, 1, 1], (8 - 1 - 2) / (8 - 1),
                               rtol=1e-5)


def test_respose2d_shapes():
    m = ResPoseNet2D(num_joints=24, depth_dim=8, layers=(1, 1, 1, 1))
    x = jnp.ones((1, 32, 32, 8))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    # 32 -> /4 stem -> /8 stages = 1 -> x8 deconv = 8; J*depth channels.
    assert y.shape == (1, 8, 8, 24 * 8)


def test_nlospose_posenet2d_backbone():
    cfg = default_config().tiny(SIZE)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone="posenet2d")
    )
    model, lct = build_nlospose(cfg.model)
    meas = jnp.ones((1, 1, SIZE, SIZE, SIZE), jnp.float32)
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(0), meas)
    heatmaps, refine = model.apply(variables, meas, lct, train=False)
    d = cfg.model.heatmap_size[0]
    assert heatmaps.shape[:2] == (1, 24)
    assert heatmaps.shape[2] == d
    assert refine.shape == (1, 1, SIZE, SIZE, SIZE)
    assert bool(jnp.isfinite(heatmaps).all())
