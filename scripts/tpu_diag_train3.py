"""Round-3 training diagnostics, part 3.

  pool     on-chip validation + timing of the Pallas phase-pool fwd/bwd
           at the production stem shape (risk-first: tiny shape, then big).
  stem3    StemS2D train grad with the kernelled pool.
  insitu   bisection of the full-model backward: grads of the pipeline
           truncated after each stage, with the real remat structure —
           the difference between successive numbers is the stage's
           IN-SITU fwd+bwd cost (the standalone probes summed to ~545 ms
           but the real model measures ~700 ms).

Usage: python scripts/tpu_diag_train3.py pool stem3 insitu
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

rng = np.random.RandomState(0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timeit(tag, fn, iters=5, warmup=2):
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


def group_pool():
    from hiddenpose_tpu.ops.pallas.phase_pool import (
        phase_maxpool_pallas,
        phase_maxpool_vjp_pallas,
    )
    from hiddenpose_tpu.ops.space_to_depth import phase_maxpool_k3s2

    # Small first: a fault costs ~5 min of worker recovery.
    for (b, d2, h2, w2, c) in ((1, 8, 8, 8, 16), (2, 64, 64, 64, 64)):
        log(f"pool fwd ({b}, {d2}, {h2}, {w2}, {8 * c}):")
        y2 = jnp.asarray(
            np.maximum(rng.randn(b, d2, h2, w2, 8 * c), 0).astype(np.float32))
        got = np.asarray(phase_maxpool_pallas(y2, interpret=False))
        want = np.asarray(jax.jit(phase_maxpool_k3s2)(y2))
        err = np.abs(got - want).max()
        log(f"  fwd max err {err:.2e}")
        assert err == 0.0, err

        g = jnp.asarray(rng.randn(b, d2, h2, w2, c).astype(np.float32))
        gotb = np.asarray(phase_maxpool_vjp_pallas(y2, g, interpret=False))
        wantb = np.asarray(jax.jit(
            lambda y, g: jax.vjp(phase_maxpool_k3s2, y)[1](g)[0])(y2, g))
        errb = np.abs(gotb - wantb).max()
        log(f"  bwd max err {errb:.2e}")
        assert errb < 1e-5, errb

    f = jax.jit(lambda y: phase_maxpool_pallas(y, interpret=False))
    timeit("fwd pallas", lambda: f(y2))
    fx = jax.jit(phase_maxpool_k3s2)
    timeit("fwd xla", lambda: fx(y2))
    fb = jax.jit(
        lambda y, g: phase_maxpool_vjp_pallas(y, g, interpret=False))
    timeit("bwd pallas", lambda: fb(y2, g))
    fbx = jax.jit(lambda y, g: jax.vjp(phase_maxpool_k3s2, y)[1](g)[0])
    timeit("bwd xla", lambda: fbx(y2, g))


def group_stem3():
    from hiddenpose_tpu.models.posenet3d import StemS2D

    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    stem = StemS2D(features=64, train=True)
    v = jax.jit(stem.init)(jax.random.PRNGKey(0), x)

    def loss(p, x):
        out, _ = stem.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x,
            mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    timeit("stem fwd [pool-kernel]", lambda: jax.jit(loss)(v["params"], x))
    g = jax.jit(jax.grad(loss))
    timeit("stem grad [pool-kernel]", lambda: g(v["params"], x))


def group_insitu():
    from hiddenpose_tpu.config import default_config
    from hiddenpose_tpu.models.nlospose import build_nlospose

    size, batch = 128, 2
    cfg = default_config().preset_t128()
    model, lct = build_nlospose(cfg.model)
    meas = jnp.asarray(rng.rand(batch, 1, size, size, size).astype(np.float32))
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(410), meas[:1])

    # Truncated pipelines re-created from the model's bound modules with
    # the same remat structure (mirrors NlosPose.__call__).
    def run_until(stage):
        def fwd(params, meas):
            md = model.bind(
                {"params": params, "batch_stats": variables["batch_stats"]},
                mutable=["batch_stats"])
            x = jnp.transpose(meas, (0, 2, 3, 4, 1))
            x = md.feature_extraction(x, True)
            if stage == "fe":
                return jnp.sum(x ** 2)
            b_, ch = meas.shape[0], x.shape[-1]
            flat = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(
                b_ * ch, *x.shape[1:4])
            from hiddenpose_tpu.ops.lct import lct_apply

            vol = jax.checkpoint(lambda m, p: lct_apply(m, p))(flat, lct)
            vol = vol.reshape(b_, ch, *vol.shape[1:]).transpose(0, 2, 3, 4, 1)
            if stage == "lct":
                return jnp.sum(vol ** 2)
            from hiddenpose_tpu.ops.normalize import normalize_feature_last

            feature = normalize_feature_last(vol)
            if stage == "norm":
                return jnp.sum(feature ** 2)
            refine = md.autoencoder(feature, True)
            if stage == "unet":
                return jnp.sum(refine ** 2)
            hm = md.pose_net(feature + refine, train=True)
            return jnp.sum(hm ** 2) + jnp.sum(refine ** 2)

        return jax.jit(jax.grad(fwd))

    for stage in ("fe", "lct", "norm", "unet", "full"):
        g = run_until(stage)
        timeit(f"grads through {stage}", lambda: g(variables["params"], meas))


GROUPS = {"pool": group_pool, "stem3": group_stem3, "insitu": group_insitu}


def main():
    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")
    for name in (sys.argv[1:] or list(GROUPS)):
        log(f"=== group {name} ===")
        GROUPS[name]()
    log("DONE")


if __name__ == "__main__":
    main()
