"""On-chip validation + A/B timing: kernel-side depth halos (kdma) in the
double-buffered conv3p kernels (round-5 VERDICT #2).

kdma removes the host-side depth-halo pad — a full HBM write+read of every
conv/adjoint/wgrad operand per call (the round-4 UNet-grad profile's
'halo slice-start pairs') — by folding first/interior/last DMA branches
into the kernels' prefetched copies and filling the boundary plane
in-scratch.

Three tiers:
  1. bit-exactness kdma vs host-pad vs blocking at the model shapes;
  2. standalone kernel timings (fwd / adjoint / wgrad) x (hostpad / kdma);
  3. composed A/B: UNet train-mode grad, full train step, infer forward
     (fresh trace per env setting — the gate is read at trace time).

Runs standalone (python scripts/tpu_validate_kdma.py) or as a
tpu_worker.py job body via run(LOG).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _sync(out):
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])


def _timeit(fn, iters=20, warmup=2):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def run(log):
    run_kernels(log)
    return run_composed(log)


def run_kernels(log):
    from hiddenpose_tpu.ops.pallas.conv3p import (
        conv3_planes,
        conv3_planes_adjoint,
        conv3_planes_wgrad,
    )

    rng = np.random.RandomState(7)
    log(f"backend={jax.default_backend()}")

    # --- tier 1+2: per-kernel exactness and timing at model shapes ---
    shapes = [
        # (b, cin, cout, d, h, w, pad, act, prer) — FE stem + UNet shapes
        (2, 1, 4, 128, 128, 128, "edge", "leaky", None),
        (2, 4, 4, 128, 128, 128, "edge", "leaky", None),
        (2, 4, 8, 64, 64, 64, "zero", "relu", None),
        (2, 8, 4, 64, 64, 64, "zero", "relu", None),
    ]
    for (b, cin, cout, d, h, w, pad, act, prer) in shapes:
        tag = f"c{cin}->{cout} {d}x{h}x{w} {pad}"
        x = jnp.asarray(rng.rand(b, cin, d, h, w).astype(np.float32))
        k = jnp.asarray((rng.rand(3, 3, 3, cin, cout) - 0.5).astype(np.float32))
        bias = jnp.asarray(rng.rand(cout).astype(np.float32))
        dz = jnp.asarray(rng.rand(b, cout, d, h, w).astype(np.float32))

        f_host = jax.jit(lambda x, k, bias: conv3_planes(
            x, k, bias, act=act, pad_mode=pad, db=True, kdma=False))
        f_kdma = jax.jit(lambda x, k, bias: conv3_planes(
            x, k, bias, act=act, pad_mode=pad, db=True, kdma=True))
        y0 = np.asarray(f_host(x, k, bias))
        y1 = np.asarray(f_kdma(x, k, bias))
        exact = np.array_equal(y0, y1)
        log(f"fwd  {tag}: exact={exact} "
            f"maxdiff={np.abs(y0 - y1).max():.2e}")
        t0 = _timeit(lambda: f_host(x, k, bias))
        t1 = _timeit(lambda: f_kdma(x, k, bias))
        log(f"fwd  {tag}: hostpad {t0*1e3:.2f} ms  kdma {t1*1e3:.2f} ms "
            f"({t0/t1:.2f}x)")

        a_host = jax.jit(lambda dz, k: conv3_planes_adjoint(
            dz, k, pad_mode=pad, db=True, kdma=False))
        a_kdma = jax.jit(lambda dz, k: conv3_planes_adjoint(
            dz, k, pad_mode=pad, db=True, kdma=True))
        y0 = np.asarray(a_host(dz, k))
        y1 = np.asarray(a_kdma(dz, k))
        log(f"adj  {tag}: exact={np.array_equal(y0, y1)} "
            f"maxdiff={np.abs(y0 - y1).max():.2e}")
        t0 = _timeit(lambda: a_host(dz, k))
        t1 = _timeit(lambda: a_kdma(dz, k))
        log(f"adj  {tag}: hostpad {t0*1e3:.2f} ms  kdma {t1*1e3:.2f} ms "
            f"({t0/t1:.2f}x)")

        if cin * cout <= 32:
            w_host = jax.jit(lambda x, dz: conv3_planes_wgrad(
                x, dz, pad_mode=pad, db=True, kdma=False))
            w_kdma = jax.jit(lambda x, dz: conv3_planes_wgrad(
                x, dz, pad_mode=pad, db=True, kdma=True))
            g0 = w_host(x, dz)
            g1 = w_kdma(x, dz)
            dk0, dk1 = np.asarray(g0[0]), np.asarray(g1[0])
            log(f"wgrd {tag}: exact={np.array_equal(dk0, dk1)} "
                f"maxdiff={np.abs(dk0 - dk1).max():.2e}")
            t0 = _timeit(lambda: w_host(x, dz))
            t1 = _timeit(lambda: w_kdma(x, dz))
            log(f"wgrd {tag}: hostpad {t0*1e3:.2f} ms  kdma {t1*1e3:.2f} ms "
                f"({t0/t1:.2f}x)")

    return None


def run_composed(log):
    # --- tier 3: composed A/Bs (fresh build per env value: the gate is
    # read when the MODEL code traces, so each setting needs a new jit) ---
    from hiddenpose_tpu.config import default_config
    from hiddenpose_tpu.models.nlospose import build_nlospose
    from hiddenpose_tpu.models.unet3d import UNet3d
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState
    from hiddenpose_tpu.train.step import make_forward, make_train_step

    rng = np.random.RandomState(7)
    cfg = default_config().preset_t128()
    meas = jnp.asarray(rng.rand(2, 1, 128, 128, 128).astype(np.float32))
    x_unet = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))

    results = {}
    prev_flag = os.environ.get("HP_CONV3P_KDMA")
    for flag in ("0", "1"):
        os.environ["HP_CONV3P_KDMA"] = flag

        un = UNet3d(in_channels=1, n_channels=4)
        uv = jax.jit(un.init)(jax.random.PRNGKey(0), x_unet[:1, :32, :32, :32])

        def uloss(p, x):
            return jnp.sum(un.apply(p, x, train=True) ** 2)

        ug = jax.jit(jax.grad(uloss))
        results[f"unet_grad_{flag}"] = _timeit(lambda: ug(uv, x_unet), 10)
        log(f"unet_grad kdma={flag}: "
            f"{results[f'unet_grad_{flag}']*1e3:.2f} ms")

        model, lct = build_nlospose(cfg.model)
        variables = jax.jit(
            lambda r, m: model.init(r, m, lct, train=False)
        )(jax.random.PRNGKey(410), meas[:1])
        fwd = make_forward(model)
        results[f"infer_{flag}"] = _timeit(
            lambda: fwd(variables, meas, lct)[0], 10)
        log(f"infer kdma={flag}: {results[f'infer_{flag}']*1e3:.2f} ms "
            f"({2/results[f'infer_{flag}']:.2f} vol/s)")

        tx = make_optimizer(cfg.train, steps_per_epoch=1)
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx)
        h = 64
        batch = {
            "meas": meas,
            "vol": jnp.asarray(
                (rng.rand(2, 1, 128, 128, 128) > 0.5).astype(np.float32)),
            "joints": jnp.asarray((rng.rand(2, 72) * h).astype(np.float32)),
            "joints_vis": jnp.ones((2, 72), jnp.float32),
        }
        step = make_train_step(model, donate=False)
        results[f"train_{flag}"] = _timeit(
            lambda: step(state, batch, lct)[1], 6)
        log(f"train kdma={flag}: {results[f'train_{flag}']*1e3:.2f} ms "
            f"({2/results[f'train_{flag}']:.2f} vol/s)")

    # Restore the ambient gate (the worker process outlives this job).
    if prev_flag is None:
        os.environ.pop("HP_CONV3P_KDMA", None)
    else:
        os.environ["HP_CONV3P_KDMA"] = prev_flag

    log("summary: " + "  ".join(
        f"{k}={v*1e3:.1f}ms" for k, v in sorted(results.items())))
    return results


if __name__ == "__main__":
    def _log(m):
        print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
    run(_log)
