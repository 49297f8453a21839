"""Reference-scale learning run (round-2 VERDICT #7).

Trains NlosPose at the full reference configuration (128^3, t128) with the
EXACT reference recipe — seed 410, Adam 1e-3, MultiStepLR [2,4,13] x 0.2
with the step-before-epoch quirk, batch 2, 15 epochs
(`/root/reference/train.py:98,140-141,191-220`, `config/config_noise.py:
84-91`) — on the deterministic synthetic transient source (pose_v2_noise is
not mounted on this machine), and records a converging MPJPE curve through
`eval/harness.py`.

Usage: python scripts/learning_run.py [--size 128] [--epochs 15]
       [--steps-per-epoch 32] [--train-samples 64] [--eval-samples 8]
Writes ./learning_curve.json (per-epoch MPJPE + losses + timing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")


class CachedSource:
    """Memoises synthetic samples: the 128^3 generator costs seconds per
    sample on this 1-core host and DataPipeline re-decodes every epoch."""

    def __init__(self, source):
        self._source = source
        self._cache = {}

    def __len__(self):
        return len(self._source)

    def __getitem__(self, i):
        if i not in self._cache:
            self._cache[i] = self._source[int(i)]
        return self._cache[i]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--steps-per-epoch", type=int, default=32)
    p.add_argument("--train-samples", type=int, default=64)
    p.add_argument("--eval-samples", type=int, default=8)
    p.add_argument("--out", type=str, default="./learning_curve.json")
    args = p.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from hiddenpose_tpu.config import t128_config
    from hiddenpose_tpu.data.dataset import DataPipeline, SyntheticSource
    from hiddenpose_tpu.eval.harness import evaluate
    from hiddenpose_tpu.models.nlospose import build_nlospose
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState
    from hiddenpose_tpu.train.step import make_train_step

    cfg = t128_config() if args.size == 128 else t128_config().tiny(args.size)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, end_epoch=args.epochs)
    )

    train_src = CachedSource(
        SyntheticSource(cfg, length=args.train_samples, seed=cfg.train.seed)
    )
    eval_src = CachedSource(
        SyntheticSource(cfg, length=args.eval_samples, seed=90210)
    )

    model, lct = build_nlospose(cfg.model)
    pipe = DataPipeline(
        train_src, batch_size=cfg.train.batch_size, shuffle=True,
        seed=cfg.train.seed, num_workers=2,
    )
    steps_per_epoch = min(args.steps_per_epoch, len(pipe))

    import jax.numpy as jnp

    example = train_src[0]
    # Jit the init: eager init at 128^3 dispatches thousands of tiny ops
    # through the device relay and takes tens of minutes.
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(cfg.train.seed), jnp.asarray(example["meas"][None]))
    tx = make_optimizer(cfg.train, steps_per_epoch=steps_per_epoch)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    train_step = make_train_step(model)

    curve = []
    m0 = evaluate(model, state, lct, eval_src, batch_size=2, num_workers=2)
    print(f"epoch -1 (init): MPJPE {m0['mpjpe']:.3f} voxels", flush=True)
    curve.append({"epoch": -1, **{k: float(v) for k, v in m0.items()}})

    t_start = time.time()
    for epoch in range(args.epochs):
        pipe.set_epoch(epoch)
        t0 = time.time()
        losses = []
        for step, batch in enumerate(pipe):
            if step >= steps_per_epoch:
                break
            data = {k: jnp.asarray(v) for k, v in batch.items()
                    if k != "person_id"}
            state, metrics = train_step(state, data, lct)
            losses.append(metrics["loss"])
        losses = [float(l) for l in jax.device_get(losses)]
        m = evaluate(model, state, lct, eval_src, batch_size=2, num_workers=2)
        rec = {
            "epoch": epoch,
            "mean_loss": float(np.mean(losses)),
            "epoch_seconds": time.time() - t0,
            **{k: float(v) for k, v in m.items()},
        }
        curve.append(rec)
        print(
            f"epoch {epoch}: loss {rec['mean_loss']:.4f} "
            f"MPJPE {rec['mpjpe']:.3f} PCK@4 {rec['pck']:.3f} "
            f"({rec['epoch_seconds']:.0f}s)", flush=True,
        )
        with open(args.out, "w") as f:
            json.dump({
                "config": "t128 reference recipe (seed 410, Adam 1e-3, "
                          "MultiStep [2,4,13] x0.2, batch 2)",
                "total_seconds": time.time() - t_start,
                "curve": curve,
            }, f, indent=1)

    print(f"done: init MPJPE {curve[0]['mpjpe']:.3f} -> "
          f"final {curve[-1]['mpjpe']:.3f} voxels "
          f"({time.time()-t_start:.0f}s total)")


if __name__ == "__main__":
    main()
