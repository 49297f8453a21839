"""Round-3 diagnostics, part 9: profile the stem grad with the custom-VJP
conv and time PoseNet3D grad (native convs) with remat on/off.

Usage: python scripts/tpu_diag_stemvjp.py [stem] [posenet]
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

rng = np.random.RandomState(0)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def sync(o):
    np.asarray(jnp.ravel(jax.tree.leaves(o)[0])[0])


def timeit(tag, fn, iters=5, warmup=2):
    t0 = time.perf_counter()
    for _ in range(warmup):
        sync(fn())
    log(f"{tag}: compile+warmup {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn()
    sync(o)
    dt = (time.perf_counter() - t0) / iters
    log(f"{tag}: {dt * 1000:.2f} ms")
    return dt


def profile(tag, fn, top=25):
    trace_dir = f"/tmp/hp_prof_{tag}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            o = fn()
        sync(o)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for p in glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if plane.name != "/device:TPU:0":
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                tot = defaultdict(float)
                for ev in line.events:
                    tot[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
                log(f"--- {tag}: XLA Ops total {sum(tot.values()) / 3:.1f} ms/iter ---")
                for nm, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
                    log(f"  {ms / 3:7.2f} ms  {nm[:130]}")


def main():
    which = sys.argv[1:] or ["stem", "posenet"]
    from hiddenpose_tpu.models.posenet3d import PoseNet3D, StemS2D

    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))

    if "stem" in which:
        model = StemS2D(features=64, train=True)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

        def loss(p, x):
            out, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))
        timeit("stem grad", lambda: g(v["params"], x))
        profile("stemvjp", lambda: g(v["params"], x))

    if "posenet" in which:
        for remat in (True, False):
            model = PoseNet3D(num_joints=24, remat=remat)
            vv = jax.jit(
                lambda r, m: model.init(r, m, train=False)
            )(jax.random.PRNGKey(0), x[:1])

            def loss2(p, x):
                out, _ = model.apply(
                    {"params": p, "batch_stats": vv["batch_stats"]}, x,
                    train=True, mutable=["batch_stats"],
                )
                return jnp.sum(out.astype(jnp.float32) ** 2)

            g2 = jax.jit(jax.grad(loss2))
            timeit(f"posenet grad remat={remat}", lambda: g2(vv["params"], x))
    log("DONE")


if __name__ == "__main__":
    main()
