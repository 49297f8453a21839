"""Device mesh and sharding layout.

The reference has no distributed execution at all (SURVEY §2.6: only a
commented-out DataParallel at `train.py:111`).  Here multi-chip is
first-class: a `jax.sharding.Mesh` over ('data',) (optionally x ('model',)),
batch sharded over 'data', parameters/LCT constants replicated.  Gradient
all-reduce is inserted by XLA through `jit` autodiff — the TPU-native
equivalent of DDP/NCCL.

Layout reasoning (scaling-book recipe): the NlosPose workload is activation-
dominated (128^3 volumes, batch 2-8 per chip) with a modest ~130M-param
model, so pure DP over ICI is optimal; the only tensor big enough to merit
spatial sharding is the padded FFT cube, which XLA can shard under pjit if a
256^3 config ever exceeds HBM (SURVEY §2.6).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_devices() -> list:
    """Device pool for mesh construction.

    Honors an explicitly-pinned ``jax_default_device`` (used by the test
    suite to force the 8-device virtual CPU backend even when a TPU plugin
    registered itself with higher priority); otherwise the default backend.
    """
    pinned = jax.config.jax_default_device
    if pinned is not None:
        return jax.devices(pinned.platform)
    return jax.devices()


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else default_devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, LCT constants) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
