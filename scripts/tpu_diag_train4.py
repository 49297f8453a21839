"""Round-3 training diagnostics, part 4: the Bottleneck backward anatomy
and stem-remat HBM-pressure experiments.

  block   one Bottleneck at 64^3 c64/256: full grad, grad with frozen BN
          stats, and the bare 3^3 c64->64 conv's fwd/dx/dk — where do
          layer1's 139 ms (5.7x fwd) go?
  pose2   PoseNet3D full grad with/without remat_stem (standalone).
  final   full-model grads + full train step with the winning config.

Usage: python scripts/tpu_diag_train4.py block pose2 final
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


def group_block():
    from hiddenpose_tpu.models.posenet3d import Bottleneck

    x = jnp.asarray(rng.randn(2, 64, 64, 64, 256).astype(np.float32) * 0.1)
    blk = Bottleneck(planes=64, stride=1, use_projection=False, train=True)
    v = jax.jit(lambda r, x: blk.init(r, x))(jax.random.PRNGKey(0), x)

    def loss(p, x):
        out, _ = blk.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x,
            mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    log("bottleneck 64^3 in=256 planes=64:")
    timeit("fwd", lambda: jax.jit(loss)(v["params"], x))
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    timeit("grad (params+x)", lambda: g(v["params"], x))

    blk_eval = Bottleneck(planes=64, stride=1, use_projection=False,
                          train=False)

    def loss_eval(p, x):
        out = blk_eval.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x)
        return jnp.sum(out ** 2)

    ge = jax.jit(jax.grad(loss_eval, argnums=(0, 1)))
    timeit("grad, frozen BN stats", lambda: ge(v["params"], x))

    # bare 3^3 conv c64->64 @ 64^3 NDHWC
    k = jnp.asarray(rng.randn(3, 3, 3, 64, 64).astype(np.float32) * 0.05)
    xc = jnp.asarray(rng.randn(2, 64, 64, 64, 64).astype(np.float32))
    dz = jnp.asarray(rng.randn(2, 64, 64, 64, 64).astype(np.float32))

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )

    log("bare conv3 c64->64 64^3:")
    f = jax.jit(conv)
    timeit("fwd", lambda: f(xc, k))
    gx = jax.jit(jax.grad(lambda x, k: jnp.sum(conv(x, k) * dz), argnums=0))
    timeit("dx", lambda: gx(xc, k))
    gk = jax.jit(jax.grad(lambda x, k: jnp.sum(conv(x, k) * dz), argnums=1))
    timeit("dk", lambda: gk(xc, k))

    # 1x1 conv c256->64 @ 64^3 (the bottleneck's conv1)
    k1 = jnp.asarray(rng.randn(1, 1, 1, 256, 64).astype(np.float32) * 0.05)
    x1 = jnp.asarray(rng.randn(2, 64, 64, 64, 256).astype(np.float32))
    dz1 = jnp.asarray(rng.randn(2, 64, 64, 64, 64).astype(np.float32))
    log("bare conv1 c256->64 64^3:")
    f1 = jax.jit(conv)
    timeit("fwd", lambda: f1(x1, k1))
    g1 = jax.jit(jax.grad(
        lambda x, k: jnp.sum(conv(x, k) * dz1), argnums=(0, 1)))
    timeit("dx+dk", lambda: g1(x1, k1))


def group_pose2():
    from hiddenpose_tpu.models.posenet3d import PoseNet3D

    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    for remat_stem in (False, True):
        pn = PoseNet3D(num_joints=24, remat_stem=remat_stem)
        log(f"PoseNet3D grad remat_stem={remat_stem}:")
        v = jax.jit(lambda r, x: pn.init(r, x, train=True))(
            jax.random.PRNGKey(0), x)

        def loss(p, x):
            out, _ = pn.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        g = jax.jit(jax.grad(loss))
        timeit(f"grad rs={remat_stem}", lambda: g(v["params"], x))


def group_final():
    from hiddenpose_tpu.config import default_config
    from hiddenpose_tpu.models.nlospose import build_nlospose
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState
    from hiddenpose_tpu.train.step import make_train_step

    size, batch = 128, 2
    cfg = default_config().preset_t128()
    model, lct = build_nlospose(cfg.model)
    meas = jnp.asarray(rng.rand(batch, 1, size, size, size).astype(np.float32))
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(410), meas[:1])
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    batch_data = {
        "meas": meas,
        "vol": jnp.asarray(
            (rng.rand(batch, 1, size, size, size) > 0.5).astype(np.float32)),
        "joints": jnp.asarray((rng.rand(batch, 72) * 64).astype(np.float32)),
        "joints_vis": jnp.ones((batch, 72), jnp.float32),
    }
    step_fn = make_train_step(model, donate=False)
    timeit("full train step", lambda: step_fn(state, batch_data, lct)[1])


GROUPS = {"block": group_block, "pose2": group_pose2, "final": group_final}


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
