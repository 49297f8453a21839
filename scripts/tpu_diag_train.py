"""Round-3 training-path diagnostic: where do 900 ms/step go at 128^3 b2?

Measures, on the real chip, the fwd and bwd cost of each suspect op so the
optimisation work is aimed at measurements, not guesses:

  conv     conv3p forward / Pallas adjoint (dx) / XLA weight-grad (dk),
           vs the plain-XLA conv's dx/dk, at the FE (c1) and UNet (c4)
           shapes — is the custom VJP's dk the fe_grad 84 ms?
  pool     max_pool2_planes (reduce_window -> select_and_scatter bwd)
           vs a slice-chain max (select bwd), fwd + grad.
  stem     StemS2D train-path grad; phase_maxpool_k3s2 grad alone.
  posenet  train fwd, stack-only grad, head-only grad, remat on/off.
  ab       FeatureExtraction/UNet grads with HP_NO_PALLAS 0 vs 1.

Usage:  python scripts/tpu_diag_train.py conv pool stem posenet ab
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

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
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    log(f"  {tag}: {dt * 1000:.2f} ms")
    return dt


def group_conv():
    from hiddenpose_tpu.ops.pallas.conv3p import (
        _weight_grad_xla,
        conv3_planes,
        conv3_planes_adjoint,
        conv3_planes_diff,
        conv3_planes_xla,
    )

    for (cin, cout, d, pad) in ((1, 1, 128, "edge"), (4, 4, 128, "zero"),
                                (8, 8, 64, "zero")):
        log(f"conv c{cin}->{cout} {d}^3 {pad}:")
        x = jnp.asarray(rng.randn(2, cin, d, d, d).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * .2)
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        dz = jnp.asarray(rng.randn(2, cout, d, d, d).astype(np.float32))

        timeit("fwd pallas", lambda: conv3_planes(
            x, k, b, act="leaky", pad_mode=pad, interpret=False))
        timeit("adjoint (dx) pallas", lambda: conv3_planes_adjoint(
            dz, k, pad_mode=pad, interpret=False))
        wg = jax.jit(functools.partial(_weight_grad_xla, pad_mode=pad))
        timeit("weight-grad xla (dk)", lambda: wg(x, dz))

        def loss_p(x, k, b):
            return jnp.sum(conv3_planes_diff(
                x, k, b, act="leaky", pad_mode=pad, interpret=False) * dz)

        def loss_x(x, k, b):
            return jnp.sum(conv3_planes_xla(
                x, k, b, act="leaky", pad_mode=pad) * dz)

        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
        gx_dx = jax.jit(jax.grad(loss_x, argnums=0))
        gx_dk = jax.jit(jax.grad(loss_x, argnums=1))
        timeit("full grad custom-vjp", lambda: gp(x, k, b))
        timeit("full grad xla", lambda: gx(x, k, b))
        timeit("dx-only xla", lambda: gx_dx(x, k, b))
        timeit("dk-only xla", lambda: gx_dk(x, k, b))


def _maxpool2_slices(x):
    """MaxPool3d(2,2) on (B, C, D, H, W) as a max over 8 strided slices —
    backward is selects + strided-slice transposes, no select_and_scatter."""
    m = None
    for dd in range(2):
        for hh in range(2):
            for ww in range(2):
                s = x[:, :, dd::2, hh::2, ww::2]
                m = s if m is None else jnp.maximum(m, s)
    return m


def group_pool():
    from hiddenpose_tpu.models.unet3d import max_pool2_planes

    for (c, d) in ((4, 128), (8, 64)):
        log(f"maxpool2 c{c} {d}^3:")
        x = jnp.asarray(rng.randn(2, c, d, d, d).astype(np.float32))

        f_rw = jax.jit(max_pool2_planes)
        f_sl = jax.jit(_maxpool2_slices)
        timeit("fwd reduce_window", lambda: f_rw(x))
        timeit("fwd slice-chain", lambda: f_sl(x))
        got = np.asarray(f_rw(x))
        want = np.asarray(f_sl(x))
        assert np.array_equal(got, want), "slice-chain != reduce_window"

        g_rw = jax.jit(jax.grad(lambda x: jnp.sum(max_pool2_planes(x) ** 2)))
        g_sl = jax.jit(jax.grad(lambda x: jnp.sum(_maxpool2_slices(x) ** 2)))
        timeit("grad reduce_window", lambda: g_rw(x))
        timeit("grad slice-chain", lambda: g_sl(x))


def group_stem():
    from hiddenpose_tpu.models.posenet3d import StemS2D
    from hiddenpose_tpu.ops.space_to_depth import phase_maxpool_k3s2

    log("phase_maxpool_k3s2 (2, 64^3, 512):")
    y2 = jnp.asarray(rng.randn(2, 64, 64, 64, 512).astype(np.float32))
    f = jax.jit(phase_maxpool_k3s2)
    timeit("fwd", lambda: f(y2))
    g = jax.jit(jax.grad(lambda y: jnp.sum(phase_maxpool_k3s2(y) ** 2)))
    timeit("grad", lambda: g(y2))

    log("StemS2D train=True (2, 128^3, 1):")
    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    stem = StemS2D(features=64, train=True)
    v = jax.jit(stem.init)(jax.random.PRNGKey(0), x)

    def loss(p, x):
        out, _ = stem.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x,
            mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    fwd = jax.jit(lambda p, x: loss(p, x))
    timeit("fwd", lambda: fwd(v["params"], x))
    g = jax.jit(jax.grad(loss))
    timeit("grad", lambda: g(v["params"], x))


def group_posenet():
    from hiddenpose_tpu.models.posenet3d import DeconvHead, PoseNet3D

    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))

    for remat in (True, False):
        pn = PoseNet3D(num_joints=24, remat=remat)
        log(f"PoseNet3D train=True remat={remat} (2, 128^3, 1):")
        v = jax.jit(lambda r, x: pn.init(r, x, train=True))(
            jax.random.PRNGKey(0), x)

        def loss(p, x):
            out, _ = pn.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        fwd = jax.jit(lambda p, x: loss(p, x))
        timeit("fwd", lambda: fwd(v["params"], x))
        try:
            g = jax.jit(jax.grad(loss))
            timeit("grad", lambda: g(v["params"], x))
        except Exception as e:  # OOM without remat is expected
            log(f"  grad FAILED: {type(e).__name__}: {str(e)[:200]}")
        if not remat:
            break  # only need the one comparison point

    log("DeconvHead train=True (2, 16^3, 2048):")
    h = jnp.asarray(rng.randn(2, 16, 16, 16, 2048).astype(np.float32) * .1)
    head = DeconvHead()
    vh = jax.jit(lambda r, x: head.init(r, x, train=True))(
        jax.random.PRNGKey(0), h)

    def hloss(p, x):
        out, _ = head.apply(
            {"params": p, "batch_stats": vh["batch_stats"]}, x, train=True,
            mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    timeit("fwd", lambda: jax.jit(hloss)(vh["params"], h))
    gh = jax.jit(jax.grad(hloss))
    timeit("grad", lambda: gh(vh["params"], h))


def group_ab():
    from hiddenpose_tpu.models.blocks import FeatureExtraction
    from hiddenpose_tpu.models.unet3d import UNet3d

    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))

    for flag in ("0", "1"):
        os.environ["HP_NO_PALLAS"] = flag
        tag = "pallas" if flag == "0" else "xla"

        fe = FeatureExtraction(basedim=1, stride=1)
        fv = jax.jit(fe.init)(jax.random.PRNGKey(0), x)
        g = jax.jit(jax.grad(
            lambda v, x: jnp.sum(fe.apply(v, x, train=True) ** 2)))
        timeit(f"fe grad [{tag}]", lambda: g(fv, x))

        un = UNet3d(in_channels=1, n_channels=4)
        uv = jax.jit(un.init)(jax.random.PRNGKey(0), x)
        gu = jax.jit(jax.grad(
            lambda v, x: jnp.sum(un.apply(v, x, train=True) ** 2)))
        timeit(f"unet grad [{tag}]", lambda: gu(uv, x))
    os.environ["HP_NO_PALLAS"] = "0"


GROUPS = {
    "conv": group_conv,
    "pool": group_pool,
    "stem": group_stem,
    "posenet": group_posenet,
    "ab": group_ab,
}


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
