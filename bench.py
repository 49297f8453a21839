"""Benchmark CLI — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): full NlosPose meas→joints inference
throughput (volumes/sec/chip) at the reference's live configuration
(t128: T=128, 128x128 spatial, 64^3 heatmaps — `train.py:77-86`).

``vs_baseline`` is the speedup over the single-CPU-host baseline recorded in
``BENCH_BASELINE_CPU.json`` (measured once with JAX_PLATFORMS=cpu on this
image; north-star target is >=10x per chip).

Env knobs: HP_BENCH_BATCH (default 2), HP_BENCH_SIZE (default 128),
HP_BENCH_ITERS (default 10), HP_BENCH_MODE (default 'infer'; 'train' times
the full jitted train step, 'lct' times the standalone reconstruction
kernel — BASELINE configs[1,4]).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sync(out) -> None:
    """Force completion of `out`'s computation chain.

    On the axon TPU relay `jax.block_until_ready` returns immediately, so
    synchronisation must be a (tiny) device→host transfer; the device
    executes programs in order, so fetching any element of the last output
    fences every queued iteration."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def _timeit(fn, iters: int, warmup: int = None) -> float:
    if warmup is None:
        warmup = int(os.environ.get("HP_BENCH_WARMUP", "2"))
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def run_bench(mode: str, size: int, batch: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hiddenpose_tpu.config import default_config
    from hiddenpose_tpu.models.nlospose import build_nlospose
    from hiddenpose_tpu.ops.lct import lct_apply, make_lct_params
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState
    from hiddenpose_tpu.train.step import make_forward, make_train_step

    rng = np.random.RandomState(410)

    if mode == "lct":
        params = make_lct_params(size, size, 0.01 * (512 // size))
        meas = jnp.asarray(rng.rand(batch, size, size, size).astype(np.float32))
        f = jax.jit(lct_apply)
        sec = _timeit(lambda: f(meas, params), iters)
        return dict(metric=f"lct_{size}^3_b{batch}", sec_per_iter=sec,
                    volumes_per_sec=batch / sec)

    cfg = default_config().preset_t128() if size == 128 else \
        default_config().tiny(size)
    model, lct = build_nlospose(cfg.model)
    meas = jnp.asarray(
        rng.rand(batch, 1, size, size, size).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(410), meas[:1], lct, train=False)

    if mode == "train":
        tx = make_optimizer(cfg.train, steps_per_epoch=1)
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx
        )
        h = size // 2
        batch_data = {
            "meas": meas,
            "vol": jnp.asarray(
                (rng.rand(batch, 1, size, size, size) > 0.5).astype(np.float32)
            ),
            "joints": jnp.asarray((rng.rand(batch, 72) * h).astype(np.float32)),
            "joints_vis": jnp.ones((batch, 72), jnp.float32),
        }
        step_fn = make_train_step(model, donate=False)
        sec = _timeit(lambda: step_fn(state, batch_data, lct)[1], iters)
        return dict(metric=f"train_step_{size}^3_b{batch}", sec_per_iter=sec,
                    volumes_per_sec=batch / sec)

    forward = make_forward(model)
    sec = _timeit(lambda: forward(variables, meas, lct)[0], iters)
    return dict(metric=f"nlospose_infer_{size}^3_b{batch}", sec_per_iter=sec,
                volumes_per_sec=batch / sec)


def main():
    mode = os.environ.get("HP_BENCH_MODE", "infer")
    size = int(os.environ.get("HP_BENCH_SIZE", "128"))
    batch = int(os.environ.get("HP_BENCH_BATCH", "2"))
    iters = int(os.environ.get("HP_BENCH_ITERS", "10"))

    res = run_bench(mode, size, batch, iters)

    baseline_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE_CPU.json"
    )
    vs = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        key = res["metric"]
        if key in base:
            vs = res["volumes_per_sec"] / base[key]["volumes_per_sec"]

    out = {
        "metric": res["metric"] + " (meas→joints throughput)"
        if mode == "infer" else res["metric"],
        "value": round(res["volumes_per_sec"], 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
