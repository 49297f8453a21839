'''Seed-sweep runs B (init lottery) and C (order lottery) — continuation of
job 123 whose run A (the exact recipe seeds) completed before the job was
cut for time.  Appends to /root/repo/learning_curve_r4.json.

Runs under scripts/tpu_worker.py's exec harness, which injects jax/jnp/np
and LOG into the globals; the fallbacks below also make it standalone-
runnable for reproduction.'''
import dataclasses
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if "LOG" not in globals():
    LOG = print

for k in ("HP_CONV3MXU", "HP_CONV3MXU_ROUTE"):
    os.environ.pop(k, None)
for m in [m for m in list(sys.modules) if m.startswith("hiddenpose_tpu")]:
    del sys.modules[m]

from hiddenpose_tpu.config import t128_config
from hiddenpose_tpu.data.dataset import DataPipeline, SyntheticSource
from hiddenpose_tpu.eval.harness import evaluate
from hiddenpose_tpu.models.nlospose import build_nlospose
from hiddenpose_tpu.train.optim import make_optimizer
from hiddenpose_tpu.train.state import TrainState
from hiddenpose_tpu.train.step import make_train_step


class CachedSource:
    def __init__(self, source):
        self._source = source
        self._cache = {}

    def __len__(self):
        return len(self._source)

    def __getitem__(self, i):
        if i not in self._cache:
            self._cache[i] = self._source[int(i)]
        return self._cache[i]


EPOCHS, STEPS, NTRAIN, NEVAL = 15, 32, 64, 16
cfg = t128_config()
cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, end_epoch=EPOCHS))
train_src = CachedSource(SyntheticSource(cfg, length=NTRAIN, seed=410))
eval_src = CachedSource(SyntheticSource(cfg, length=NEVAL, seed=90210))
model, lct = build_nlospose(cfg.model)
train_step = make_train_step(model)
OUT = "/root/repo/learning_curve_r4.json"
with open(OUT) as f:
    doc = json.load(f)
runs = doc["runs"]

for tag, init_seed, order_seed in [("B_init", 1, 410), ("C_order", 410, 1)]:
    t_run = time.time()
    pipe = DataPipeline(train_src, batch_size=2, shuffle=True,
                        seed=order_seed, num_workers=2)
    ex = jnp.asarray(train_src[0]["meas"][None])
    variables = jax.jit(lambda r, m: model.init(r, m, lct, train=False))(
        jax.random.PRNGKey(init_seed), ex)
    tx = make_optimizer(cfg.train, steps_per_epoch=STEPS)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    curve = []
    m0 = evaluate(model, state, lct, eval_src, batch_size=2, num_workers=2)
    curve.append({"epoch": -1, **{k: float(v) for k, v in m0.items()}})
    for epoch in range(EPOCHS):
        pipe.set_epoch(epoch)
        losses = []
        for step, batch in enumerate(pipe):
            if step >= STEPS:
                break
            data = {k: jnp.asarray(v) for k, v in batch.items() if k != "person_id"}
            state, metrics = train_step(state, data, lct)
            losses.append(metrics["loss"])
        losses = [float(l) for l in jax.device_get(losses)]
        m = evaluate(model, state, lct, eval_src, batch_size=2, num_workers=2)
        curve.append({"epoch": epoch, "mean_loss": float(np.mean(losses)),
                      **{k: float(v) for k, v in m.items()}})
        LOG(f"{tag} ep{epoch}: loss {curve[-1]['mean_loss']:.2f} "
            f"MPJPE {curve[-1]['mpjpe']:.3f} PCK {curve[-1]['pck']:.3f}")
        # Incremental write so a timeout preserves partial curves.
        snap = [r for r in runs if r["run"] != tag]
        snap.append({"run": tag, "init_seed": init_seed, "order_seed": order_seed,
                     "seconds": time.time() - t_run, "curve": curve,
                     "final_mpjpe": curve[-1]["mpjpe"],
                     "final_pck": curve[-1]["pck"],
                     "complete": epoch == EPOCHS - 1})
        doc["runs"] = snap
        runs = snap
        with open(OUT, "w") as f:
            json.dump(doc, f, indent=1)
    LOG(f"RUN {tag}: final MPJPE {curve[-1]['mpjpe']:.3f} PCK@4 "
        f"{curve[-1]['pck']:.3f} ({time.time()-t_run:.0f}s)")
fin = [r["final_mpjpe"] for r in runs]
LOG(f"SWEEP finals: {fin}")
