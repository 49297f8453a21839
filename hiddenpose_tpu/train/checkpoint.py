"""Checkpoint save/restore (Orbax).

TPU-native equivalent of the reference's torch.save of
{model_state_dict, optimizer_state_dict, lr_scheduler, epoch}
(`/root/reference/train.py:210-220`, mid-epoch at
`utils/train_epoch.py:78-90`) and the `continue_train` restore
(`train.py:151-156`): here the whole TrainState pytree (params, batch_stats,
opt_state, step) plus epoch/global_iter metadata is one atomic checkpoint.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    directory: str,
    state,
    epoch: int,
    global_iter: int = 0,
    name: Optional[str] = None,
) -> str:
    """Write `<directory>/<name or epoch_{epoch}>` atomically."""
    import orbax.checkpoint as ocp

    name = name or f"epoch_{epoch}"
    path = os.path.abspath(os.path.join(directory, name))
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {
            "epoch": np.asarray(epoch, np.int32),
            "global_iter": np.asarray(global_iter, np.int64),
        },
    }
    # Normalise leaves to host ndarrays: jax constant-literal outputs
    # (TypedNdArray) have no Orbax TypeHandler, and device_get also keeps
    # the save independent of the (possibly sharded) device layout.
    payload = jax.tree.map(np.asarray, payload)
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, state) -> tuple[Any, int, int]:
    """Restore into a template TrainState; returns (state, epoch, global_iter).

    Resume semantics mirror `train.py:151-156`: training continues at
    epoch + 1 with optimizer/schedule state intact.
    """
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {
            "epoch": np.asarray(0, np.int32),
            "global_iter": np.asarray(0, np.int64),
        },
    }
    ckptr = _checkpointer()
    restored = ckptr.restore(os.path.abspath(path), item=template)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    meta = restored["meta"]
    return new_state, int(meta["epoch"]), int(meta["global_iter"])


def latest_checkpoint(directory: str) -> Optional[str]:
    """Most recent epoch_* checkpoint in a directory, or None."""
    if not os.path.isdir(directory):
        return None
    cands = [d for d in os.listdir(directory) if d.startswith("epoch_")]
    if not cands:
        return None
    best = max(cands, key=lambda d: int(d.split("_")[1]))
    return os.path.join(directory, best)
