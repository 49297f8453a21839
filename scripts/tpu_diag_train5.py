"""Round-3 training diagnostics, part 5: in-situ pressure/precision sweep.

Full-model gradient timing under config variants, hunting the ~150 ms
in-situ degradation of the PoseNet backward (standalone 334 ms, in-situ
~485 ms at 128^3 b2):

  base      b2 f32 (reproduces the 611 ms bisection endpoint)
  rstem     b2 f32 + posenet_remat_stem (saved stem tensors ~2.2 GB -> 134 MB)
  b1        b1 f32 control: if 2x(b1) << b2, the gap is HBM pressure
  bf16      b2 with_bf16 (halved activation traffic; mixed-precision train)
  step      full train step (donate on) with the best of the above

Usage: python scripts/tpu_diag_train5.py base rstem b1 bf16 step
"""

import dataclasses
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


def grads_runner(cfg, batch):
    from hiddenpose_tpu.models.nlospose import build_nlospose

    size = 128
    model, lct = build_nlospose(cfg.model)
    meas = jnp.asarray(rng.rand(batch, 1, size, size, size).astype(np.float32))
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(410), meas[:1])

    def loss_fn(params, meas):
        (hm, refine), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            meas, lct, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(hm.astype(jnp.float32) ** 2) \
            + jnp.sum(refine.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss_fn))
    return lambda: g(variables["params"], meas)


def main():
    from hiddenpose_tpu.config import default_config

    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")

    cfg0 = default_config().preset_t128()

    for name in (sys.argv[1:] or ["base", "rstem", "b1", "bf16", "step"]):
        log(f"=== {name} ===")
        if name == "base":
            timeit("grads b2 f32", grads_runner(cfg0, 2))
        elif name == "rstem":
            cfg = dataclasses.replace(
                cfg0, model=dataclasses.replace(
                    cfg0.model, posenet_remat_stem=True))
            timeit("grads b2 rstem", grads_runner(cfg, 2))
        elif name == "b1":
            timeit("grads b1 f32", grads_runner(cfg0, 1))
        elif name == "bf16":
            timeit("grads b2 bf16", grads_runner(cfg0.with_bf16(), 2))
        elif name == "step":
            from hiddenpose_tpu.models.nlospose import build_nlospose
            from hiddenpose_tpu.train.optim import make_optimizer
            from hiddenpose_tpu.train.state import TrainState
            from hiddenpose_tpu.train.step import make_train_step

            best = os.environ.get("HP_STEP_VARIANT", "base")
            cfg = cfg0
            if best == "rstem":
                cfg = dataclasses.replace(
                    cfg0, model=dataclasses.replace(
                        cfg0.model, posenet_remat_stem=True))
            elif best == "bf16":
                cfg = cfg0.with_bf16()
            model, lct = build_nlospose(cfg.model)
            batch = 2
            meas = jnp.asarray(
                rng.rand(batch, 1, 128, 128, 128).astype(np.float32))
            variables = jax.jit(
                lambda r, m: model.init(r, m, lct, train=False)
            )(jax.random.PRNGKey(410), meas[:1])
            tx = make_optimizer(cfg.train, steps_per_epoch=1)
            state = TrainState.create(
                variables["params"], variables["batch_stats"], tx)
            bd = {
                "meas": meas,
                "vol": jnp.asarray((rng.rand(batch, 1, 128, 128, 128) > 0.5
                                    ).astype(np.float32)),
                "joints": jnp.asarray(
                    (rng.rand(batch, 72) * 64).astype(np.float32)),
                "joints_vis": jnp.ones((batch, 72), jnp.float32),
            }
            step_fn = make_train_step(model, donate=False)
            timeit(f"train step [{best}]",
                   lambda: step_fn(state, bd, lct)[1])
    log("DONE")


if __name__ == "__main__":
    main()
