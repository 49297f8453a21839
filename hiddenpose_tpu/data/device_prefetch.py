"""Host→device batch prefetching.

The reference relies on torch pin_memory + synchronous `.to(device)` per
step (`utils/train_epoch.py:37`).  Here batches are `jax.device_put` ahead of
time while the device computes — transfers overlap with the previous step
because dispatch is asynchronous.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Iterator, Optional

import jax


def device_prefetch(
    iterator: Iterator[Dict],
    sharding=None,
    buffer_size: int = 2,
    drop_keys: tuple = ("person_id",),
) -> Iterator[Dict]:
    """Yield device-resident batches, keeping `buffer_size` in flight."""

    def put(batch):
        data = {k: v for k, v in batch.items() if k not in drop_keys}
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), data)
        return jax.tree.map(jax.device_put, data)

    queue = deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= buffer_size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
