"""On-chip validation + timing of the Pallas weight-grad kernel, then the
in-situ effect on FeatureExtraction/UNet train gradients."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timeit(tag, fn, iters=5, warmup=2):
    t0 = time.perf_counter()
    for _ in range(warmup):
        _sync(fn())
    log(f"  {tag}: warmup+compile {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    log(f"  {tag}: {dt * 1000:.2f} ms")
    return dt


def main():
    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")

    from hiddenpose_tpu.ops.pallas.conv3p import (
        _weight_grad_xla,
        conv3_planes_wgrad,
    )

    rng = np.random.RandomState(0)

    for (cin, cout, d, h, w, pad) in (
        (1, 1, 128, 128, 128, "edge"),
        (1, 4, 128, 128, 128, "zero"),
        (4, 4, 128, 128, 128, "zero"),
        (4, 8, 64, 64, 64, "zero"),
    ):
        log(f"wgrad c{cin}->{cout} {d}x{h}x{w} {pad}:")
        x = jnp.asarray(rng.randn(2, cin, d, h, w).astype(np.float32))
        dz = jnp.asarray(rng.randn(2, cout, d, h, w).astype(np.float32))

        got_dk, got_db = jax.jit(
            lambda x, dz: conv3_planes_wgrad(x, dz, pad_mode=pad,
                                             interpret=False)
        )(x, dz)
        import functools

        want = jax.jit(functools.partial(_weight_grad_xla, pad_mode=pad))(
            x, dz)
        want_db = dz.sum(axis=(0, 2, 3, 4))
        ek = float(jnp.abs(got_dk - want).max() / (jnp.abs(want).max() + 1e-9))
        eb = float(jnp.abs(got_db - want_db).max()
                   / (jnp.abs(want_db).max() + 1e-9))
        log(f"  rel err dk {ek:.2e} db {eb:.2e}")
        assert ek < 5e-3 and eb < 1e-4, (cin, cout, ek, eb)

        f = jax.jit(lambda x, dz: conv3_planes_wgrad(
            x, dz, pad_mode=pad, interpret=False))
        timeit("pallas wgrad", lambda: f(x, dz))

    # In-situ: FE and UNet train grads with the kernelled dk.
    from hiddenpose_tpu.models.blocks import FeatureExtraction
    from hiddenpose_tpu.models.unet3d import UNet3d

    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))

    fe = FeatureExtraction(basedim=1, stride=1)
    fv = jax.jit(fe.init)(jax.random.PRNGKey(0), x)
    g = jax.jit(jax.grad(
        lambda v, x: jnp.sum(fe.apply(v, x, train=True) ** 2)))
    timeit("fe grad [pallas+wgrad]", lambda: g(fv, x))

    un = UNet3d(in_channels=1, n_channels=4)
    uv = jax.jit(un.init)(jax.random.PRNGKey(0), x)
    gu = jax.jit(jax.grad(
        lambda v, x: jnp.sum(un.apply(v, x, train=True) ** 2)))
    timeit("unet grad [pallas+wgrad]", lambda: gu(uv, x))

    log("DONE")


if __name__ == "__main__":
    main()
