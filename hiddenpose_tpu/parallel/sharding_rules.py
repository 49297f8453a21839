"""Parameter sharding rules: optional tensor parallelism over 'model'.

The workload is DP-first (SURVEY §2.6), but the wide conv kernels of the
pose backbone (layer3/4 bottlenecks and the deconv head reach 1024-2048
channels) shard cleanly on their output-channel axis.  These rules build a
`NamedSharding` pytree for the params so `jit` places big kernels across the
'model' mesh axis and inserts the all-gathers/reduce-scatters itself —
useful when HBM per chip is the constraint (e.g. larger grids or batch).

Everything else (small kernels, biases, norm scales, LCT constants) stays
replicated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def params_tp_sharding(
    params: Any,
    mesh: Mesh,
    min_channels: int = 256,
) -> Any:
    """NamedSharding pytree: conv/dense kernels with a last (out-channel)
    axis >= min_channels and divisible by the 'model' axis size shard on
    'model'; everything else replicates."""
    model_size = mesh.shape.get("model", 1)

    def rule(leaf):
        shape = np.shape(leaf)
        if (
            model_size > 1
            and len(shape) >= 2
            and shape[-1] >= min_channels
            and shape[-1] % model_size == 0
        ):
            spec = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def apply_tp(params: Any, mesh: Mesh, min_channels: int = 256) -> Any:
    """Place params according to :func:`params_tp_sharding`."""
    shardings = params_tp_sharding(params, mesh, min_channels)
    return jax.tree.map(jax.device_put, params, shardings)
