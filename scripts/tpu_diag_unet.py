"""Round-4 diagnostics: per-HLO attribution of the UNet3d train-mode
gradient (the largest non-posenet piece of the step backward, ~46 ms at
128^3 b2) via a jax.profiler device trace — same methodology as
tpu_diag_prof.py.
"""

import glob
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from hiddenpose_tpu.models.unet3d import UNet3d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    un = UNet3d(in_channels=1, n_channels=4)
    v = jax.jit(un.init)(jax.random.PRNGKey(0), x[:1, :32, :32, :32])

    def loss(p, x):
        return jnp.sum(un.apply(p, x, train=True) ** 2)

    g = jax.jit(jax.grad(loss))

    def _sync(out):
        np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])

    for _ in range(2):
        _sync(g(v, x))
    t0 = time.perf_counter()
    for _ in range(5):
        out = g(v, x)
    _sync(out)
    log(f"unet grad: {(time.perf_counter() - t0) / 5 * 1000:.2f} ms")

    trace_dir = "/tmp/hp_prof_unet"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = g(v, x)
        _sync(out)

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            tot = defaultdict(float)
            cnt = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    nm = ev_meta.get(ev.metadata_id, "?")
                    tot[nm] += ev.duration_ps / 1e9
                    cnt[nm] += 1
            items = sorted(tot.items(), key=lambda kv: -kv[1])
            total = sum(tot.values())
            log(f"--- plane {plane.name}: {total/3:.1f} ms/iter over 3 iters ---")
            for nm, ms in items[:25]:
                log(f"{ms/3:7.2f} ms  x{cnt[nm]//3:<3d} {nm[:110]}")


if __name__ == "__main__":
    main()
