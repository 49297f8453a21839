"""Grain-based input pipeline (optional alternative to `DataPipeline`).

Wraps the framework's indexable sources (`NlosPoseSource`, `SyntheticSource`,
...) as a Grain `RandomAccessDataSource` and builds a multi-worker
`grain.DataLoader` with deterministic shuffling and batching — the
production-grade host pipeline the north star asks for ("Grain/tf.data-style
host pipeline feeding device-resident kernels").  Falls back with a clear
error if grain is unavailable; `DataPipeline` (threaded) remains the
default and has identical batch semantics.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import numpy as np


class _SourceAdapter:
    """Grain RandomAccessDataSource over our dict-sample sources."""

    def __init__(self, source):
        self._source = source

    def __len__(self) -> int:
        return len(self._source)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        return self._source[int(index)]


def _make_transforms():
    import grain.python as grain

    class DropStrings(grain.MapTransform):
        """Pre-batch: numeric fields only (grain.Batch tree-stacks arrays)."""

        def map(self, sample):
            return {k: v for k, v in sample.items()
                    if isinstance(v, np.ndarray)}

    class Finalize(grain.MapTransform):
        """Post-batch: flatten joints to (B, J*3) + all-ones visibility
        (matching `dataset.collate` / `utils/train_epoch.py:39-40`)."""

        def map(self, batch):
            joints = np.asarray(batch["joints"])
            joints = joints.reshape(joints.shape[0], -1).astype(np.float32)
            out = dict(batch)
            out["joints"] = joints
            out["joints_vis"] = np.ones_like(joints)
            return out

    return DropStrings(), Finalize()


def make_grain_loader(
    source,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 410,
    num_workers: int = 4,
    num_epochs: Optional[int] = None,
    shard_options=None,
):
    """Returns an iterable of collated batch dicts backed by grain workers.

    ``shard_options``: a ``grain.ShardOptions`` for multi-host runs — use
    ``parallel.distributed.grain_shard_options()`` to derive it from
    ``jax.process_index/count`` (defaults to no sharding)."""
    import grain.python as grain

    sampler = grain.IndexSampler(
        num_records=len(source),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=shard_options or grain.NoSharding(),
    )
    drop_strings, finalize = _make_transforms()
    operations = [
        drop_strings,
        grain.Batch(batch_size=batch_size, drop_remainder=True),
        finalize,
    ]
    return grain.DataLoader(
        data_source=_SourceAdapter(source),
        sampler=sampler,
        operations=operations,
        worker_count=num_workers,
    )
