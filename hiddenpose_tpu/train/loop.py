"""Training driver: the epoch loop.

Re-design of `/root/reference/train.py:97-229` + `utils/train_epoch.py:11-104`
as a function over (Config, data source):

* seed 410 determinism (`train.py:98`)
* Adam + MultiStep schedule incl. the step-before-epoch quirk (see
  `train/optim.py`)
* jitted, batch-sharded train step (gradient all-reduce via jit autodiff)
* scalar logging every `log_every` iters; visual artifacts via `viz/`
* per-epoch and per-10000-iter checkpoints; `continue_train` resume
* wall-clock epoch/ETA prints matching `train.py:207-208`
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from hiddenpose_tpu.config import Config
from hiddenpose_tpu.data.dataset import DataPipeline, SyntheticSource
from hiddenpose_tpu.models.nlospose import build_nlospose
from hiddenpose_tpu.parallel.mesh import make_mesh, replicate
from hiddenpose_tpu.train import checkpoint as ckpt
from hiddenpose_tpu.train.optim import make_optimizer
from hiddenpose_tpu.train.state import TrainState
from hiddenpose_tpu.train.step import make_train_step
from hiddenpose_tpu.utils.logging import MetricWriter, create_logger


@dataclass
class TrainResult:
    state: TrainState
    last_metrics: dict
    epochs_run: int


from hiddenpose_tpu.data.device_prefetch import device_prefetch
from hiddenpose_tpu.parallel.mesh import batch_sharding


def train(
    cfg: Config,
    source=None,
    workdir: str = "./checkpoints",
    resume_from: Optional[str] = None,
    log_every: int = 100,
    ckpt_every_iters: int = 10000,
    max_steps_per_epoch: Optional[int] = None,
    use_mesh: bool = True,
    viz_every: Optional[int] = None,
    viz_histograms: bool = False,
    shard_index: int = 0,
    shard_count: int = 1,
) -> TrainResult:
    logger = create_logger(cfg.log_dir, phase=cfg.phase)
    writer = MetricWriter(cfg.log_dir)

    model, lct = build_nlospose(cfg.model)
    if source is None:
        source = SyntheticSource(cfg, length=8)
    pipeline = DataPipeline(
        source,
        batch_size=cfg.train.batch_size,
        shuffle=True,
        seed=cfg.train.seed,
        num_workers=cfg.num_workers,
        shard_index=shard_index,
        shard_count=shard_count,
    )
    steps_per_epoch = max_steps_per_epoch or len(pipeline)

    rng = jax.random.PRNGKey(cfg.train.seed)
    example = next(iter(pipeline))
    variables = model.init(
        rng, jax.numpy.asarray(example["meas"][:1]), lct, train=False
    )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logger.info(f"Total number of parameters: {n_params}")

    tx = make_optimizer(cfg.train, steps_per_epoch=steps_per_epoch)
    if cfg.model.pretrain_autoencoder:
        # Reference semantics (`models/NlosPose.py:34-40` + `unet/unet3d.py:
        # 107-118`): substitute a pretrained UNet3d and freeze it.
        from hiddenpose_tpu.train.pretrain import (
            freeze_autoencoder,
            load_pretrained_autoencoder,
        )

        variables = load_pretrained_autoencoder(
            cfg.model.pretrain_autoencoder_path, variables
        )
        tx = freeze_autoencoder(tx, variables["params"])
        logger.info(
            "loaded pretrained autoencoder from "
            f"{cfg.model.pretrain_autoencoder_path} (frozen)"
        )
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    begin_epoch = cfg.train.begin_epoch
    global_iter = 0
    if cfg.phase == "continue_train" or resume_from:
        path = resume_from or ckpt.latest_checkpoint(workdir)
        if path:
            state, epoch, global_iter = ckpt.restore_checkpoint(path, state)
            begin_epoch = epoch + 1
            logger.info(f"resumed from {path} at epoch {begin_epoch}")

    mesh = None
    from hiddenpose_tpu.parallel.mesh import default_devices

    if use_mesh and len(default_devices()) > 1:
        mesh = make_mesh()
        state = replicate(mesh, state)
        lct = replicate(mesh, lct)
        logger.info(f"data-parallel mesh over {mesh.devices.size} devices")

    train_step = make_train_step(
        model,
        matmul_precision=getattr(cfg.train, "matmul_precision", "default"),
    )

    begin_time = time.time()
    metrics = {}
    epochs_run = 0
    # Device-side metrics window: the loop issues `log_every` async steps
    # with ZERO host round-trips between them (round-1 VERDICT #3 — the
    # reference's `loss.item()` per iteration, `utils/train_epoch.py:46`,
    # is a wart we deliberately do not port).  Finiteness is checked when
    # the window is fetched, so the NaN guard keeps its abort-and-restore
    # semantics with at most `log_every` steps of detection latency.
    metrics_window = []

    def _flush_window():
        """One device→host fetch for the whole window.

        Returns (host_window, bad_metrics): bad_metrics is the first
        non-finite-loss entry, or None if the window is clean.
        """
        if not metrics_window:
            return [], None
        host = jax.device_get(metrics_window)
        metrics_window.clear()
        for m in host:
            if not np.isfinite(float(m["loss"])):
                return host, m
        return host, None

    def _abort(bad, where):
        # Trainer-level failure detection (the reference has none —
        # SURVEY §5): stop rather than poison the optimizer state;
        # the last epoch checkpoint remains restorable.
        logger.error(
            f"non-finite loss {float(bad['loss'])} detected at {where}; "
            "aborting (restore the last checkpoint to resume)"
        )
        writer.close()
        return TrainResult(state=state, last_metrics=bad, epochs_run=epochs_run)

    sharding = batch_sharding(mesh) if mesh is not None else None
    for epoch in range(begin_epoch, cfg.train.end_epoch):
        epoch_begin = time.time()
        if hasattr(pipeline, "set_epoch"):
            pipeline.set_epoch(epoch)  # per-epoch reshuffle, reproducibly
        host_batches = iter(pipeline)
        for step, batch in enumerate(
            device_prefetch(host_batches, sharding=sharding)
        ):
            if step >= steps_per_epoch:
                break
            state, metrics = train_step(state, batch, lct)
            global_iter += 1
            metrics_window.append(metrics)

            if global_iter % log_every == 0:
                host_window, bad = _flush_window()
                if bad is not None:
                    return _abort(bad, f"iter {global_iter} window")
                mean_loss = float(
                    np.mean([float(m["loss"]) for m in host_window])
                )
                last = host_window[-1]
                writer.scalar("Train Loss", mean_loss, global_iter)
                writer.scalar(
                    "joint_loss", float(last["joint_loss"]), global_iter
                )
                writer.scalar(
                    "voxel_loss", float(last["voxel_loss"]), global_iter
                )
                logger.info(
                    f"iter {global_iter} loss {mean_loss:.5f} "
                    f"({time.time() - begin_time:.1f}s elapsed)"
                )

            if viz_every and global_iter % viz_every == 0:
                _log_visuals(
                    cfg, model, state, batch, lct, global_iter,
                    writer=writer if viz_histograms else None,
                )

            if ckpt_every_iters and global_iter % ckpt_every_iters == 0:
                _, bad = _flush_window()
                if bad is not None:
                    return _abort(bad, f"iter {global_iter} (pre-checkpoint)")
                ckpt.save_checkpoint(
                    workdir, jax.device_get(state), epoch, global_iter,
                    name=f"iter_{global_iter}",
                )

        # Flush before the epoch checkpoint so a poisoned tail of the epoch
        # can never be persisted as a "good" checkpoint.
        _, bad = _flush_window()
        if bad is not None:
            return _abort(bad, f"epoch {epoch} end")
        ckpt.save_checkpoint(workdir, jax.device_get(state), epoch, global_iter)
        epochs_run += 1
        epoch_time = time.time() - epoch_begin
        left_h = epoch_time * (cfg.train.end_epoch - epoch - 1) / 3600
        logger.info(f"epoch {epoch} used {epoch_time:.1f}s, left {left_h:.2f}h")

    writer.close()
    return TrainResult(state=state, last_metrics=metrics, epochs_run=epochs_run)


def _log_visuals(cfg, model, state, batch, lct, global_iter, writer=None):
    """Dump the reference's full per-interval artifact set
    (`utils/train_epoch.py:49-72`): volume_log of vol/output/feature with
    GT-joint overlay (`utils/visualizer.py:14-64` reads the current GT from
    ./1.txt — here the joints are passed explicitly), pred+gt joints_log,
    and threeviews_log of feature/output/vol.  Optionally per-param
    histograms (`utils/train_simdr.py:66-67`)."""
    try:
        from hiddenpose_tpu.ops.softargmax import softmax_integral
        from hiddenpose_tpu.viz.visualizer import (
            joints_log,
            threeviews_log,
            volume_log,
        )

        heatmaps, refine = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jax.numpy.asarray(batch["meas"]), lct, train=False,
        )
        out_dir = os.path.join(cfg.result_dir, "figure")
        vol_dir = os.path.join(out_dir, "volume")
        tv_dir = os.path.join(out_dir, "threeviews")
        vol = np.asarray(batch["vol"])
        output = np.asarray(heatmaps)
        feature = np.asarray(refine)
        gt = np.asarray(batch["joints"][0]).reshape(-1, 3)

        volume_log(vol, vol_dir, f"volume_{global_iter}", global_iter,
                   joints=gt)
        volume_log(output, vol_dir, f"output_{global_iter}", global_iter,
                   joints=gt)
        volume_log(feature, vol_dir, f"feature_{global_iter}", global_iter,
                   joints=gt)

        preds = softmax_integral(heatmaps, cfg.model.num_joints)
        joints_log(np.asarray(preds[0]).reshape(-1, 3),
                   os.path.join(out_dir, "joints"),
                   f"pred_joints_{global_iter}")
        joints_log(gt, os.path.join(out_dir, "joints"),
                   f"gt_joints_{global_iter}")

        threeviews_log(feature, tv_dir, f"feature_{global_iter}", global_iter)
        threeviews_log(output, tv_dir, f"output_{global_iter}", global_iter)
        threeviews_log(vol, tv_dir, f"volume_{global_iter}", global_iter)

        if writer is not None:
            flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
            for path, leaf in flat:
                tag = "/".join(str(getattr(p, "key", p)) for p in path)
                writer.histogram(f"params/{tag}", np.asarray(leaf),
                                 global_iter)
    except Exception as e:  # pragma: no cover - viz is best-effort
        import logging

        logging.getLogger("hiddenpose").warning(f"viz failed: {e}")
