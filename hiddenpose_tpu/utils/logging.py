"""Logging + metric writers.

Re-design of `/root/reference/utils/record.py:7-36` (file+console logger) and
the TensorBoard SummaryWriter usage (`train.py:143-144`,
`utils/train_epoch.py:97-104`).  The metric writer degrades gracefully: TF
summary files if TensorFlow is importable, else a JSONL file — so training
never depends on an optional package.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional


def create_logger(log_dir: str, name: str = "hiddenpose",
                  phase: str = "train") -> logging.Logger:
    """File + console logger, file named <name>_<time>_<phase>.log."""
    os.makedirs(log_dir, exist_ok=True)
    stamp = time.strftime("%Y-%m-%d-%H-%M")
    log_file = os.path.join(log_dir, f"{name}_{stamp}_{phase}.log")

    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)-15s %(message)s")
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class MetricWriter:
    """Scalar metric sink: TensorBoard events when TF is available,
    JSONL always (metrics.jsonl in log_dir)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            import tensorflow as tf  # noqa: F401

            self._tb = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "ts": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.scalar(tag, value, step=step)

    def histogram(self, tag: str, values, step: int, bins: int = 64):
        """Per-parameter histogram (reference: per-param TB histograms in
        the SimDR loop, `utils/train_simdr.py:66-67`).  JSONL sink stores
        (bin_edges, counts) summaries to stay lightweight."""
        import numpy as np

        v = np.asarray(values).ravel()
        counts, edges = np.histogram(v, bins=bins)
        rec = {
            "tag": tag, "step": int(step), "ts": time.time(),
            "hist": {
                "counts": counts.tolist(),
                "min": float(edges[0]), "max": float(edges[-1]),
                "mean": float(v.mean()) if v.size else 0.0,
                "std": float(v.std()) if v.size else 0.0,
            },
        }
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.histogram(tag, v, step=step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
