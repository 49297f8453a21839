"""Round-3 diagnostics, part 7: in-situ PoseNet3D backward with the
reformulated convs (HP_FASTCONV routing, ops/conv3d_fast.py).

Times jax.vjp of the full posenet (stem + 16 blocks + head) at the
production shape (b2, 128^3 input -> 64^3 x 24 heatmaps), f32, train-mode
BN, grad wrt params — the piece tpu_diag_train bisected to ~485 ms of the
611 ms model backward.

Usage: python scripts/tpu_diag_conv2.py base mm mmdec all norem
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

rng = np.random.RandomState(0)

VARIANTS = {
    "base": "",
    "mm": "mm",
    "mmdec": "mm,deconv",
    "all": "mm,deconv,d2d",
    "norem": "mm,deconv",  # + remat off
}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timeit(tag, fn, iters=5, warmup=2):
    t0 = time.perf_counter()
    for _ in range(warmup):
        _sync(fn())
    log(f"  {tag}: compile+warmup {time.perf_counter() - t0:.0f} s")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    log(f"  {tag}: {dt * 1000:.2f} ms")
    return dt


def main():
    from hiddenpose_tpu.models.posenet3d import PoseNet3D

    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")

    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))

    for name in (sys.argv[1:] or ["base", "mm", "mmdec", "all", "norem"]):
        flags = VARIANTS[name]
        os.environ["HP_FASTCONV"] = flags
        model = PoseNet3D(num_joints=24, remat=(name != "norem"))
        variables = jax.jit(
            lambda r, m: model.init(r, m, train=False)
        )(jax.random.PRNGKey(0), x[:1])
        log(f"=== {name}: HP_FASTCONV='{flags}' remat={name != 'norem'} ===")

        def loss_fn(params, x):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        fwd = jax.jit(lambda p, x: loss_fn(p, x))
        timeit("fwd(train)", lambda: fwd(variables["params"], x))
        g = jax.jit(jax.grad(loss_fn))
        timeit("grad", lambda: g(variables["params"], x))
    log("DONE")


if __name__ == "__main__":
    main()
