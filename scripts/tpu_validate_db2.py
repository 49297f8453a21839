"""On-chip validation + timing, round 2: double-buffered conv3p kernels.

Covers forward (with the td-preserving VMEM budget), adjoint and wgrad db
variants, and the FeatureExtraction stage A/B.  The zero-pad + pre-affine
case compares db vs blocking directly (their shared affine-on-fills halo
semantics differ from conv3_planes_xla by design at the first/last plane;
the combination is unused by the models).
"""

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


def timeit(tag, fn, iters=20, warmup=2):
    t0 = time.perf_counter()
    for _ in range(warmup):
        _sync(fn())
    log(f"  {tag}: compile+warmup {time.perf_counter() - t0:.0f} s")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    log(f"  {tag}: {dt * 1000:.2f} ms")
    return dt


def relmax(a, b):
    a = np.asarray(jax.device_get(a), np.float32)
    b = np.asarray(jax.device_get(b), np.float32)
    return float(np.abs(a - b).max())


def main():
    from hiddenpose_tpu.ops.pallas.conv3p import (
        conv3_planes, conv3_planes_adjoint, conv3_planes_wgrad,
    )

    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")

    rng = np.random.RandomState(0)

    log("=== forward (td-preserving budget) ===")
    for (b, cin, cout, d, h, w, pad, act, prer) in [
        (2, 1, 4, 128, 128, 128, "edge", "leaky", None),
        (2, 4, 4, 128, 128, 128, "edge", "leaky", None),
        (2, 8, 4, 128, 128, 128, "edge", "relu", True),
    ]:
        tag = f"fwd c{cin}->{cout} {d}^3"
        x = jnp.asarray(rng.randn(b, cin, d, h, w).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.2)
        bias = jnp.asarray(rng.randn(cout).astype(np.float32))
        ps = jnp.asarray(rng.rand(cin).astype(np.float32) + 0.5) if prer else None
        pf = jnp.asarray(rng.randn(cin).astype(np.float32)) if prer else None
        kw = dict(act=act, pad_mode=pad, pre_relu=prer)
        y0 = conv3_planes(x, k, bias, None, ps, pf, db=False, **kw)
        y1 = conv3_planes(x, k, bias, None, ps, pf, db=True, **kw)
        log(f"{tag}: db vs blocking err {relmax(y1, y0):.2e}")
        t0 = timeit(f"{tag} blocking", lambda: conv3_planes(
            x, k, bias, None, ps, pf, db=False, **kw))
        t1 = timeit(f"{tag} db      ", lambda: conv3_planes(
            x, k, bias, None, ps, pf, db=True, **kw))
        log(f"  speedup {t0 / t1:.2f}x")

    log("=== adjoint / wgrad ===")
    for (b, cin, cout, d, h, w, pad) in [
        (2, 4, 4, 128, 128, 128, "edge"),
        (2, 8, 4, 128, 128, 128, "zero"),
    ]:
        dz = jnp.asarray(rng.randn(b, cout, d, h, w).astype(np.float32))
        x = jnp.asarray(rng.randn(b, cin, d, h, w).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.2)
        tag = f"adj c{cin}->{cout} {pad}"
        a0 = conv3_planes_adjoint(dz, k, pad_mode=pad, db=False)
        a1 = conv3_planes_adjoint(dz, k, pad_mode=pad, db=True)
        log(f"{tag}: db vs blocking err {relmax(a1, a0):.2e}")
        t0 = timeit(f"{tag} blocking", lambda: conv3_planes_adjoint(
            dz, k, pad_mode=pad, db=False))
        t1 = timeit(f"{tag} db      ", lambda: conv3_planes_adjoint(
            dz, k, pad_mode=pad, db=True))
        log(f"  speedup {t0 / t1:.2f}x")

        tag = f"wgrad c{cin}->{cout} {pad}"
        g0 = conv3_planes_wgrad(x, dz, pad_mode=pad, db=False)
        g1 = conv3_planes_wgrad(x, dz, pad_mode=pad, db=True)
        log(f"{tag}: db vs blocking err dk {relmax(g1[0], g0[0]):.2e} "
            f"db {relmax(g1[1], g0[1]):.2e}")
        t0 = timeit(f"{tag} blocking", lambda: conv3_planes_wgrad(
            x, dz, pad_mode=pad, db=False))
        t1 = timeit(f"{tag} db      ", lambda: conv3_planes_wgrad(
            x, dz, pad_mode=pad, db=True))
        log(f"  speedup {t0 / t1:.2f}x")

    log("=== FeatureExtraction stage (in-jit) ===")
    from hiddenpose_tpu.models.blocks import FeatureExtraction

    fe = FeatureExtraction(basedim=1, stride=1)  # production config basedim
    meas = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    params = fe.init(jax.random.PRNGKey(0), meas, False)

    for dbv in ("0", "1"):
        os.environ["HP_CONV3P_DB"] = dbv
        f = jax.jit(lambda p, m: fe.apply(p, m, False))
        timeit(f"FE stage db={dbv}", lambda: f(params, meas))
    log("DONE")


if __name__ == "__main__":
    main()
