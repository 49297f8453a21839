"""UNet3d planes-layout implementation (round 2): equivalence between the
Pallas stencil-kernel inference path and the XLA path, plus odd-size
robustness.  (Supersedes the round-1 s2d_top variant, which measured slower
than native and was removed.)"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

import jax
import jax.numpy as jnp

from hiddenpose_tpu.models.unet3d import UNet3d


def test_doubleconv_pallas_path_matches_xla():
    """One DoubleConv, same params: use_pallas (interpreted on CPU) vs XLA.
    The full-UNet kernel path is exercised on real TPU hardware (bench);
    interpret-mode over the whole net is minutes-slow on CI, so the CI
    equivalence pin is per-block + the kernel tests in test_conv3p.py."""
    from hiddenpose_tpu.models.unet3d import DoubleConv

    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.rand(1, 1, 8, 16, 16).astype(np.float32))
    m = DoubleConv(4)
    v = jax.jit(lambda r, x: m.init(r, x, False))(jax.random.PRNGKey(0), xp)
    y_xla = m.apply(v, xp, False)
    y_pal = m.apply(v, xp, True)  # StencilConv3 -> conv3_planes (interpret)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_xla), rtol=1e-4, atol=1e-5
    )


def test_unet_odd_sizes_fall_back():
    # 12 -> 6 -> 3: odd bottleneck levels; the conv gate must fall back to
    # XLA cleanly (StencilConv3 eligibility requires H % 8 == 0).
    x = jnp.ones((1, 12, 12, 12, 1))
    m = UNet3d()
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_unet_param_tree_stable():
    """Round-1 param layout preserved (checkpoint compatibility)."""
    x = jnp.ones((1, 16, 16, 16, 1))
    v = jax.jit(UNet3d().init)(jax.random.PRNGKey(0), x)
    p = v["params"]
    for blk in ("conv", "enc1", "enc2", "enc3", "enc4",
                "dec1", "dec2", "dec3", "dec4"):
        assert set(p[blk]) == {"conv1", "conv2", "gn1", "gn2"}, blk
        assert set(p[blk]["conv1"]) == {"kernel", "bias"}
        assert set(p[blk]["gn1"]) == {"scale", "bias"}
    assert set(p["out"]) == {"kernel", "bias"}
    assert p["out"]["kernel"].shape == (1, 1, 1, 4, 1)


def test_max_pool2_planes_custom_vjp_matches_select_and_scatter():
    """The mask-based pool backward == jax's select_and_scatter gradient,
    including first-match-in-window tie routing (all-ties + duplicated-max
    cases)."""
    import jax
    import jax.numpy as jnp

    from hiddenpose_tpu.models.unet3d import (
        _max_pool2_impl,
        max_pool2_planes,
    )

    rng = np.random.RandomState(11)
    cases = [
        jnp.asarray(rng.rand(2, 3, 8, 8, 8).astype(np.float32)),
        jnp.ones((2, 3, 8, 8, 8), jnp.float32),
        jnp.asarray(
            np.repeat(rng.rand(2, 3, 8, 8, 4).astype(np.float32), 2, axis=4)
        ),
    ]
    ct = jnp.asarray(rng.rand(2, 3, 4, 4, 4).astype(np.float32))
    for x in cases:
        y1, p1 = jax.vjp(max_pool2_planes, x)
        y0, p0 = jax.vjp(_max_pool2_impl, x)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
        np.testing.assert_array_equal(
            np.asarray(p1(ct)[0]), np.asarray(p0(ct)[0])
        )


def test_max_pool2_planes_odd_dims_fall_back_to_native():
    """Odd D/H/W (VALID pooling drops the remainder) must route to the
    native VJP instead of failing the custom backward's even-dim algebra
    at trace time."""
    import jax
    import jax.numpy as jnp

    from hiddenpose_tpu.models.unet3d import (
        _max_pool2_impl,
        max_pool2_planes,
    )

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 3, 7, 8, 9).astype(np.float32))
    ct = jnp.asarray(rng.rand(2, 3, 3, 4, 4).astype(np.float32))
    y1, p1 = jax.vjp(max_pool2_planes, x)
    y0, p0 = jax.vjp(_max_pool2_impl, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
    np.testing.assert_array_equal(
        np.asarray(p1(ct)[0]), np.asarray(p0(ct)[0])
    )
