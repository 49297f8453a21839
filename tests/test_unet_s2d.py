"""UNet3d s2d_top variant: exact equivalence with the native path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hiddenpose_tpu.models.unet3d import UNet3d


def _copy_native_to_s2d(nat, s2d):
    p = jax.tree.map(lambda a: a, s2d)
    for blk in ("conv", "dec4"):
        for i in (1, 2):
            p[blk][f"conv{i}_kernel"] = nat[blk][f"conv{i}"]["kernel"]
            p[blk][f"conv{i}_bias"] = nat[blk][f"conv{i}"]["bias"]
            p[blk][f"gn{i}"] = nat[blk][f"gn{i}"]
    p["out_kernel"] = nat["out"]["kernel"]
    p["out_bias"] = nat["out"]["bias"]
    for k in nat:
        if k.startswith(("enc", "dec")) and k != "dec4":
            p[k] = nat[k]
    return p


def test_unet_s2d_top_matches_native():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 1).astype(np.float32))
    m_nat = UNet3d(s2d_top=False)
    m_s2d = UNet3d(s2d_top=True)
    v_nat = jax.jit(m_nat.init)(jax.random.PRNGKey(0), x)
    v_s2d = jax.jit(m_s2d.init)(jax.random.PRNGKey(0), x)
    p = _copy_native_to_s2d(v_nat["params"], v_s2d["params"])
    y_nat = m_nat.apply(v_nat, x)
    y_s2d = m_s2d.apply({"params": p}, x)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_nat), rtol=1e-4, atol=1e-5
    )


def test_unet_s2d_falls_back_on_odd_sizes():
    # 12 is even but the bottleneck levels go odd (12->6->3) — the top-level
    # guard only needs even D/H/W >= 16; at 12 it must fall back cleanly.
    x = jnp.ones((1, 12, 12, 12, 1))
    m = UNet3d(s2d_top=True)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape
