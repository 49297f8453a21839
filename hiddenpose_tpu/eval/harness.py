"""Dataset-level evaluation harness.

Computes MPJPE / PA-MPJPE / PCK over a data source with the jitted eval
step — the numeric counterpart of the reference's artifact-only evaluation
(`/root/reference/test.py:203-238` logs joints but computes no metric).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from hiddenpose_tpu.data.dataset import DataPipeline
from hiddenpose_tpu.eval.metrics import mpjpe, pa_mpjpe, pck
from hiddenpose_tpu.train.step import make_eval_step


def evaluate(
    model,
    state,
    lct,
    source,
    batch_size: int = 2,
    max_batches: Optional[int] = None,
    pck_threshold: float = 4.0,
    num_workers: int = 4,
) -> Dict[str, float]:
    """Returns {'mpjpe', 'pa_mpjpe', 'pck', 'n_samples'} in heatmap voxels."""
    eval_step = make_eval_step(model)
    pipe = DataPipeline(
        source, batch_size=batch_size, shuffle=False, num_workers=num_workers,
        drop_last=False,
    )
    preds, gts = [], []
    for bi, batch in enumerate(pipe):
        if max_batches is not None and bi >= max_batches:
            break
        data = {k: jnp.asarray(v) for k, v in batch.items()
                if k != "person_id"}
        out = eval_step(state, data, lct)
        preds.append(np.asarray(out["pred_joints"]))
        gts.append(np.asarray(batch["joints"]))
    pred = np.concatenate(preds)
    gt = np.concatenate(gts)
    return {
        "mpjpe": mpjpe(pred, gt),
        "pa_mpjpe": pa_mpjpe(pred, gt),
        "pck": pck(pred, gt, pck_threshold),
        "n_samples": int(pred.shape[0]),
    }
