"""Multi-host (multi-process) tests — round-1 VERDICT #9.

Three levels:
1. In-process: `DataPipeline` shard semantics — disjoint, equal-length,
   reproducible at a pinned epoch (also covers VERDICT weak #5: iteration
   must not mutate the pipeline).
2. Two REAL processes under `jax.distributed.initialize` with gloo CPU
   collectives: each worker takes its own data shard, computes a local
   gradient, and the jit-inserted cross-process all-reduce must reproduce
   the single-process full-batch gradient bit-for-near.
3. grain ShardOptions wiring (skipped cleanly when grain is absent).

The worker subprocesses strip the TPU relay plugin from PYTHONPATH so the
distributed job runs on genuine CPU backends (same reasoning as conftest).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from hiddenpose_tpu.data.dataset import DataPipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _IdSource:
    """Tiny source whose samples are identifiable by index."""

    def __init__(self, n=16, dim=4):
        self.n, self.dim = n, dim
        rng = np.random.RandomState(7)
        self.x = rng.randn(n, dim).astype(np.float32)
        self.y = rng.randn(n, 1).astype(np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        joints = np.zeros((1, 3), np.float32)
        joints[0, 0] = i  # smuggle the index through collate
        return {
            "meas": self.x[i],
            "vol": self.y[i],
            "joints": joints,
            "person_id": str(i),
        }


def _ids(batches):
    return [int(j) for b in batches for j in np.asarray(b["joints"])[:, 0]]


def test_shards_disjoint_equal_reproducible():
    src = _IdSource(n=17)  # odd length: the tail must be dropped evenly
    pipes = [
        DataPipeline(src, batch_size=2, shuffle=True, seed=3,
                     num_workers=2, shard_index=i, shard_count=2)
        for i in range(2)
    ]
    for p in pipes:
        p.set_epoch(5)
    ids = [_ids(list(p)) for p in pipes]
    assert len(ids[0]) == len(ids[1]) == 8  # 17 -> 8 per shard
    assert not (set(ids[0]) & set(ids[1])), "shards overlap"

    # Same epoch -> identical order on re-iteration (pure __iter__).
    assert _ids(list(pipes[0])) == ids[0]
    # Different epoch -> different order.
    pipes[0].set_epoch(6)
    assert _ids(list(pipes[0])) != ids[0]


def test_single_shard_covers_everything():
    src = _IdSource(n=8)
    p = DataPipeline(src, batch_size=2, shuffle=False, num_workers=2)
    assert sorted(_ids(list(p))) == list(range(8))


_WORKER = r"""
import json, os, sys
import numpy as np

sys.path.insert(0, {repo!r})

import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from hiddenpose_tpu.parallel import distributed

pid = int(sys.argv[1])
distributed.initialize("localhost:{port}", num_processes=2, process_id=pid)
info = distributed.process_info()
assert info.shard_count == 2 and info.shard_index == pid

sys.path.insert(0, os.path.join({repo!r}, "tests"))
from test_multihost import _IdSource
from hiddenpose_tpu.data.dataset import DataPipeline

src = _IdSource(n=16)
pipe = DataPipeline(src, batch_size=8, shuffle=True, seed=11, num_workers=2,
                    shard_index=info.shard_index,
                    shard_count=info.shard_count)
pipe.set_epoch(0)
batch = next(iter(pipe))
local_ids = [int(j) for j in np.asarray(batch["joints"])[:, 0]]

# Cross-process DP gradient: global batch assembled from per-process
# shards; replicated output forces the all-reduce through jit autodiff.
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()), ("data",))
xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(batch["meas"]))
ys = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(batch["vol"]))
w = jnp.zeros((4, 1), jnp.float32)

def loss(w, x, y):
    return jnp.mean((x @ w - y) ** 2)

g = jax.jit(
    jax.grad(loss),
    out_shardings=NamedSharding(mesh, P()),
)(w, xs, ys)
out = {{"pid": pid, "ids": local_ids,
        "grad": np.asarray(g).ravel().tolist()}}
with open(os.path.join({outdir!r}, f"worker_{{pid}}.json"), "w") as f:
    json.dump(out, f)

# Exit barrier: without it the coordinator process (pid 0) can exit while
# the peer is still mid-heartbeat, which kills the peer with a spurious
# "Connection refused" from the coordination service.
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("done")
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    script = _WORKER.format(repo=REPO, port=port, outdir=str(tmp_path))
    path = tmp_path / "worker.py"
    path.write_text(script)

    # The TPU relay plugin registers via a sitecustomize at interpreter
    # START — it must be stripped from the environment BEFORE spawn (an
    # in-worker strip would run too late).
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(path), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)

    results = {}
    for pid in range(2):
        with open(tmp_path / f"worker_{pid}.json") as f:
            results[pid] = json.load(f)

    # Disjoint data shards covering 16 distinct samples.
    ids0, ids1 = set(results[0]["ids"]), set(results[1]["ids"])
    assert len(ids0) == len(ids1) == 8
    assert not (ids0 & ids1), "processes saw overlapping data"

    # Both processes computed the SAME all-reduced gradient...
    g0 = np.asarray(results[0]["grad"])
    g1 = np.asarray(results[1]["grad"])
    np.testing.assert_allclose(g0, g1, rtol=1e-6, atol=1e-7)

    # ...equal to the single-process full-batch gradient over the union.
    src = _IdSource(n=16)
    order = sorted(results[0]["ids"]) + sorted(results[1]["ids"])
    # gradient of mean((xw - y)^2) at w=0 over the union of both shards;
    # order doesn't matter for the mean.
    all_ids = results[0]["ids"] + results[1]["ids"]
    x = src.x[all_ids]
    y = src.y[all_ids]
    w = np.zeros((4, 1), np.float32)
    g_ref = 2.0 * x.T @ (x @ w - y) / len(all_ids)
    np.testing.assert_allclose(g0, g_ref.ravel(), rtol=1e-5, atol=1e-6)


def test_grain_shard_options_wiring():
    grain = pytest.importorskip("grain.python")
    from hiddenpose_tpu.parallel.distributed import (
        ShardInfo,
        grain_shard_options,
    )

    opts = grain_shard_options(ShardInfo(shard_index=1, shard_count=4))
    assert opts.shard_index == 1 and opts.shard_count == 4
    assert opts.drop_remainder
    single = grain_shard_options(ShardInfo(shard_index=0, shard_count=1))
    assert single.shard_count == 1
