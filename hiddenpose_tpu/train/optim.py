"""Optimizers and LR schedules (optax).

Re-design of `/root/reference/models/optimizer.py:9-24` (Adam / SGD from cfg)
and the MultiStepLR wiring of `train.py:140-141,193`.
"""

from __future__ import annotations

from typing import Sequence

import optax

from hiddenpose_tpu.config import TrainConfig


def multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    factor: float,
    steps_per_epoch: int,
    step_before_epoch: bool = True,
) -> optax.Schedule:
    """torch MultiStepLR as an optax per-step schedule.

    ``step_before_epoch=True`` reproduces the reference quirk of calling
    ``lr_scheduler.step()`` *before* each epoch's training (`train.py:193`):
    after k pre-epoch steps the scheduler count is k, so epoch e trains at
    base_lr * factor^|{m in milestones : m <= e + 1}|.
    """
    import jax.numpy as jnp

    offset = 1 if step_before_epoch else 0
    ms = jnp.asarray(sorted(milestones))

    def schedule(count):
        epoch = count // steps_per_epoch
        scheduler_count = epoch + offset
        n_hit = (ms <= scheduler_count).sum()
        return base_lr * (factor ** n_hit)

    return schedule


def make_optimizer(
    cfg: TrainConfig, steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    """Adam (torch defaults: b1=0.9, b2=0.999, eps=1e-8) or SGD, with the
    MultiStep schedule (`config/config_noise.py:85-88`)."""
    schedule = multistep_lr(
        cfg.lr, cfg.lr_step, cfg.lr_factor, steps_per_epoch,
        step_before_epoch=cfg.step_before_epoch,
    )
    if cfg.optimizer == "adam":
        return optax.adam(schedule)
    if cfg.optimizer == "sgd":
        return optax.sgd(schedule)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
