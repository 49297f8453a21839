#!/usr/bin/env python
"""Training entry point.

CLI-compatible re-design of `/root/reference/train.py`: same flags
(--model/--test/--log/--data/--device/--PHASE), same live configuration
(t128: bin_len 0.04, T=128, 128x128 — `train.py:77-86`), same recipe
(seed 410, Adam 1e-3, MultiStepLR [2,4,13] x0.2, batch 2, 15 epochs).

Differences: data-parallel over all visible devices by default; Orbax
checkpoints; add --synthetic to train on the built-in synthetic generator
when the pose_v2_noise dataset is not mounted.
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def parse_args():
    p = argparse.ArgumentParser(description="HiddenPose-TPU training")
    p.add_argument("--model", type=str, default="", help="model directory")
    p.add_argument("--test", type=str, default="", help="unused (parity)")
    p.add_argument("--log", type=str, default="", help="log directory")
    p.add_argument("--data", type=str, default="", help="data directory")
    p.add_argument("--device", type=int, default=0, help="device index")
    p.add_argument(
        "--PHASE", type=str, default="train",
        help="'train' | 'continue_train' | 'eval' | 'test'",
    )
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic generator (CI/demo)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--log-every", type=int, default=None,
                   help="iterations between scalar logs (default 100, like "
                        "the reference; auto-lowered for short runs)")
    p.add_argument("--size", type=int, default=128,
                   help="grid size (128 = reference config)")
    p.add_argument("--precision", type=str, default=None,
                   choices=("default", "high", "highest"),
                   help="MXU matmul precision for the train step "
                        "(cfg.train.matmul_precision; 'default' = one bf16 "
                        "pass — fastest; 'highest' trains measurably better "
                        "on this recipe at ~3.5x step cost, BENCH_NOTES)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (coordinator/process "
                        "config via HP_COORDINATOR/HP_NUM_PROCESSES/"
                        "HP_PROCESS_ID or cloud auto-detection) and shard "
                        "the data stream per process")
    return p.parse_args()


def main():
    args = parse_args()

    from hiddenpose_tpu.config import t128_config
    from hiddenpose_tpu.data.dataset import NlosPoseSource, SyntheticSource
    from hiddenpose_tpu.train.loop import train

    shard = None
    if args.multihost:
        from hiddenpose_tpu.parallel import distributed

        distributed.initialize()
        shard = distributed.process_info()
        print(f"multihost: process {shard.shard_index}/{shard.shard_count}")

    cfg = t128_config() if args.size == 128 else \
        t128_config().tiny(args.size)
    # CLI merge (utils/record.py:42-60 semantics, without the DEVICE bug).
    updates = {}
    if args.log:
        updates["log_dir"] = args.log
    if args.PHASE:
        updates["phase"] = args.PHASE
    if updates:
        cfg = dataclasses.replace(cfg, **updates)
    tr = {}
    if args.epochs is not None:
        tr["end_epoch"] = args.epochs
    if args.batch_size is not None:
        tr["batch_size"] = args.batch_size
    if args.precision is not None:
        tr["matmul_precision"] = args.precision
    if tr:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, **tr))
    if args.data:
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, train_path=args.data)
        )

    if args.synthetic or not os.path.isdir(cfg.dataset.train_path):
        source = SyntheticSource(cfg, length=max(8, cfg.train.batch_size * 4))
        print("using synthetic data source")
    else:
        source = NlosPoseSource(cfg, cfg.dataset.train_path)

    log_every = args.log_every
    if log_every is None:
        log_every = min(100, max(1, (args.steps_per_epoch or 100) // 2))

    result = train(
        cfg,
        source=source,
        workdir=args.model or cfg.final_output_dir,
        max_steps_per_epoch=args.steps_per_epoch,
        log_every=log_every,
        shard_index=shard.shard_index if shard else 0,
        shard_count=shard.shard_count if shard else 1,
    )
    print(f"finished training: {result.epochs_run} epochs, "
          f"final loss {float(result.last_metrics.get('loss', float('nan'))):.5f}")


if __name__ == "__main__":
    main()
