"""On-chip validation + timing: double-buffered conv3p forward kernel.

Compares the db kernel (host-side depth-halo pad + cross-grid-step DMA
prefetch) against the blocking-DMA kernel and XLA-HIGHEST at the
production shapes, then times the FeatureExtraction-like chain.
Round-3 VERDICT #5: target >= 1.5x standalone, FE stage <= 3 ms.
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


def main():
    from hiddenpose_tpu.ops.pallas.conv3p import conv3_planes, conv3_planes_xla

    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")

    rng = np.random.RandomState(0)
    shapes = [
        # (b, cin, cout, d, h, w, pad, act, prer)  — FE + UNet hot shapes
        (2, 1, 4, 128, 128, 128, "edge", "leaky", None),
        (2, 4, 4, 128, 128, 128, "edge", "leaky", None),
        (2, 8, 4, 128, 128, 128, "zero", "relu", True),
        (2, 4, 4, 64, 64, 64, "zero", "relu", None),
    ]
    for (b, cin, cout, d, h, w, pad, act, prer) in shapes:
        tag = f"c{cin}->{cout} {d}^3 b{b} {pad}"
        x = jnp.asarray(rng.randn(b, cin, d, h, w).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.2)
        bias = jnp.asarray(rng.randn(cout).astype(np.float32))
        ps = jnp.asarray(rng.rand(cin).astype(np.float32) + 0.5) if prer else None
        pf = jnp.asarray(rng.randn(cin).astype(np.float32)) if prer else None

        want = np.asarray(jax.device_get(conv3_planes_xla(
            x, k, bias, None, ps, pf, act=act, pad_mode=pad, pre_relu=prer)))
        got_db = np.asarray(jax.device_get(conv3_planes(
            x, k, bias, None, ps, pf, act=act, pad_mode=pad, pre_relu=prer,
            db=True)))
        err = np.abs(got_db - want).max()
        log(f"{tag}: db err vs XLA-HIGHEST {err:.2e}"
            + ("  <-- BAD" if err > 1e-3 else ""))

        t_old = timeit(f"{tag} blocking", lambda x=x, k=k, bias=bias, ps=ps,
                       pf=pf, act=act, pad=pad, prer=prer: conv3_planes(
                           x, k, bias, None, ps, pf, act=act, pad_mode=pad,
                           pre_relu=prer, db=False))
        t_db = timeit(f"{tag} db      ", lambda x=x, k=k, bias=bias, ps=ps,
                      pf=pf, act=act, pad=pad, prer=prer: conv3_planes(
                          x, k, bias, None, ps, pf, act=act, pad_mode=pad,
                          pre_relu=prer, db=True))
        log(f"  speedup {t_old / t_db:.2f}x")

    # FeatureExtraction stage in-situ (6 convs inside one jit).
    log("=== FeatureExtraction stage ===")
    from hiddenpose_tpu.config import default_config
    from hiddenpose_tpu.models.blocks import FeatureExtraction

    cfg = default_config().preset_t128()
    fe = FeatureExtraction(in_channels=1, basedim=cfg.model.basedim, stride=1)
    meas = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    params = fe.init(jax.random.PRNGKey(0), meas)

    for dbv in ("0", "1"):
        os.environ["HP_CONV3P_DB"] = dbv
        f = jax.jit(lambda p, m: fe.apply(p, m))
        timeit(f"FE stage db={dbv}", lambda: f(params, meas))
        f._clear_cache() if hasattr(f, "_clear_cache") else None
    log("DONE")


if __name__ == "__main__":
    main()
