"""Round-5 full-scale seed-sweep runner (VERDICT r4 #4, prescribed scale).

Each run trains the t128 production config with the EXACT reference recipe
(`/root/reference/train.py:98,140-141,191-220`: Adam 1e-3, MultiStepLR
[2,4,13] x0.2 with the step-before-epoch quirk, batch 2, 15 epochs) at the
FULL prescribed scale — 256 train samples, 128 steps/epoch = 1920 gradient
steps, 16 held-out eval samples.  The synthetic dataset is FIXED (seed
410 / 90210); the run seed drives BOTH the init PRNG and the shuffle
order, so across-run spread measures the combined init+order lottery at
recipe scale.

``precision`` selects the matmul rung (cfg.train.matmul_precision): the
round-5 bisect (BENCH_NOTES "Precision IS the learning-gap driver")
showed 'default' one-pass bf16 MXU costs real model quality on this
recipe, so the sweep records both the default rung (runs A/B/C) and the
recommended quality rung ('high', bf16x3 passes) for comparison.

Runs under scripts/tpu_worker.py (LOG injected; STASH carries the decoded
sample cache across jobs so each run does not pay the ~seconds/sample
synthetic generation again).  Also standalone-runnable:
    python scripts/r5_sweep_lib.py NAME SEED PRECISION
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS, STEPS, NTRAIN, NEVAL = 15, 128, 256, 16
OUT = "/root/repo/learning_curve_r5.json"


class CachedSource:
    """Memoises synthetic samples (seconds/sample on this 1-core host)."""

    def __init__(self, source, cache):
        self._source = source
        self._cache = cache

    def __len__(self):
        return len(self._source)

    def __getitem__(self, i):
        if i not in self._cache:
            self._cache[i] = self._source[int(i)]
        return self._cache[i]


def run_one(name, seed, precision, stash, log):
    import jax
    import jax.numpy as jnp

    from hiddenpose_tpu.config import t128_config
    from hiddenpose_tpu.data.dataset import DataPipeline, SyntheticSource
    from hiddenpose_tpu.eval.harness import evaluate
    from hiddenpose_tpu.models.nlospose import build_nlospose
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState
    from hiddenpose_tpu.train.step import make_train_step

    with open(OUT) as f:
        doc = json.load(f)
    done = {
        r["run"]: r for r in doc["runs"]
        if sum(1 for e in r["curve"] if e["epoch"] >= 0) >= EPOCHS
    }
    if name in done:
        log(f"{name}: already complete, skipping")
        return

    cfg = t128_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, end_epoch=EPOCHS, matmul_precision=precision)
    )
    # Dataset is FIXED across runs (seeds 410/90210); run seed varies
    # init+order only.
    tc = stash.setdefault("r5_train_cache", {})
    ec = stash.setdefault("r5_eval_cache", {})
    train_src = CachedSource(
        SyntheticSource(cfg, length=NTRAIN, seed=410), tc)
    eval_src = CachedSource(
        SyntheticSource(cfg, length=NEVAL, seed=90210), ec)

    model, lct = build_nlospose(cfg.model)
    pipe = DataPipeline(train_src, batch_size=cfg.train.batch_size,
                        shuffle=True, seed=seed, num_workers=2)
    example = train_src[0]
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(seed), jnp.asarray(example["meas"][None]))
    tx = make_optimizer(cfg.train, steps_per_epoch=STEPS)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    train_step = make_train_step(model, matmul_precision=precision)

    rec = {"run": name, "seed": seed, "precision": precision, "curve": []}

    def save():
        with open(OUT) as f:
            d = json.load(f)
        d["runs"] = [r for r in d["runs"] if r["run"] != name] + [rec]
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(d, f, indent=1)
        os.replace(tmp, OUT)

    t_start = time.time()
    m0 = evaluate(model, state, lct, eval_src, batch_size=2, num_workers=2)
    log(f"{name} epoch -1 (init): MPJPE {m0['mpjpe']:.3f}")
    rec["curve"].append({"epoch": -1, **{k: float(v) for k, v in m0.items()}})
    save()

    for epoch in range(EPOCHS):
        pipe.set_epoch(epoch)
        t0 = time.time()
        losses = []
        for step, batch in enumerate(pipe):
            if step >= STEPS:
                break
            data = {k: jnp.asarray(v) for k, v in batch.items()
                    if k != "person_id"}
            state, metrics = train_step(state, data, lct)
            losses.append(metrics["loss"])
        losses = [float(l) for l in jax.device_get(losses)]
        m = evaluate(model, state, lct, eval_src, batch_size=2, num_workers=2)
        e = {"epoch": epoch, "mean_loss": float(np.mean(losses)),
             "epoch_seconds": time.time() - t0,
             **{k: float(v) for k, v in m.items()}}
        rec["curve"].append(e)
        rec["seconds"] = time.time() - t_start
        save()
        log(f"{name} epoch {epoch}: loss {e['mean_loss']:.1f} "
            f"MPJPE {e['mpjpe']:.3f} PCK@4 {e['pck']:.3f} "
            f"({e['epoch_seconds']:.0f}s)")
    log(f"{name} done: final MPJPE {rec['curve'][-1]['mpjpe']:.3f} "
        f"({rec['seconds']:.0f}s total)")


if __name__ == "__main__":
    run_one(sys.argv[1], int(sys.argv[2]), sys.argv[3], {}, print)
