"""Round-3 diagnostics, part 8: per-HLO attribution of the PoseNet3D
train-mode gradient via a jax.profiler device trace.

Parses the captured .xplane.pb with tensorboard_plugin_profile's protos
and prints the top ops by total device time, aggregated by a coarse
category (conv kinds / matmul / transpose-copy / elementwise / reduce).

Usage: python scripts/tpu_diag_prof.py [variant] [component]
  variant: '' | 'mm' | 'mm,deconv' | ...   (HP_FASTCONV routing)
  component: posenet (default) | model | stem | head
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(out):
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])


def build(component, variant):
    os.environ["HP_FASTCONV"] = variant
    from hiddenpose_tpu.models.posenet3d import DeconvHead, PoseNet3D, StemS2D

    if component == "posenet":
        model = PoseNet3D(num_joints=24)
        x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    elif component == "stem":
        model = StemS2D(features=64, train=True)
        x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    elif component == "head":
        model = DeconvHead(num_joints=24)
        x = jnp.asarray(rng.rand(2, 8, 8, 8, 2048).astype(np.float32))
    else:
        raise SystemExit(f"unknown component {component}")

    kw = dict(train=True) if component != "stem" else {}
    variables = jax.jit(
        lambda r, m: model.init(r, m, **({} if component == "stem" else dict(train=False)))
    )(jax.random.PRNGKey(0), x[:1])

    def loss_fn(params, x):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            x, **kw, mutable=list(k for k in variables if k != "params"),
        )
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss_fn))
    return lambda: g(variables["params"], x)


def categorize(name):
    n = name.lower()
    if "convolution" in n or "conv" in n and "fusion" not in n:
        return "convolution"
    if "dot" in n:
        return "dot"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "fusion" in n:
        return "fusion"
    if "reduce" in n:
        return "reduce"
    if "dynamic" in n:
        return "dynamic-slice"
    return "other"


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else ""
    component = sys.argv[2] if len(sys.argv) > 2 else "posenet"
    log(f"backend={jax.default_backend()} variant='{variant}' component={component}")

    fn = build(component, variant)
    for _ in range(2):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn()
    _sync(out)
    log(f"grad: {(time.perf_counter() - t0) / 3 * 1000:.2f} ms")

    trace_dir = f"/tmp/hp_prof_{component}_{variant.replace(',', '_')}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fn()
        _sync(out)

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    log(f"trace files: {paths}")
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            log(f"--- plane: {plane.name} ---")
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            tot = defaultdict(float)
            cnt = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    nm = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ms
                    tot[nm] += dur
                    cnt[nm] += 1
            items = sorted(tot.items(), key=lambda kv: -kv[1])
            total = sum(tot.values())
            log(f"total event time {total:.1f} ms over 3 iters")
            cats = defaultdict(float)
            for nm, ms in tot.items():
                cats[categorize(nm)] += ms
            for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
                log(f"  [{c}] {ms / 3:.2f} ms/iter")
            for nm, ms in items[:40]:
                log(f"  {ms / 3:7.2f} ms/iter x{cnt[nm] // 3:3d}  {nm[:120]}")
    log("DONE")


if __name__ == "__main__":
    main()
