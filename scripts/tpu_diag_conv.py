"""Round-3 training diagnostics, part 6: conv formulation shootout.

Hypothesis from tpu_diag_train runs: XLA's NDHWC 3D conv *backward*
lowerings (dx = transposed conv, dk = correlation) are catastrophically
slow on this toolchain (bare 3^3 c64->64 @64^3 b2: dx 11.25 ms + dk
8.87 ms for ~116 GFLOP each ~ 6 TF/s; even the 1x1x1 c256->64 conv pays
11.3 ms for dx+dk that should be two near-peak matmuls).

Candidate reformulations whose autodiff produces matmul/2D-conv passes:
  mm    1x1x1 conv as reshape (B*D*H*W, Ci) @ (Ci, Co)
  d2d   3^3 conv as sum_dz conv2d_3x3(x[:, z+dz], W[dz]) over (B*D, H, W, C)

Usage: python scripts/tpu_diag_conv.py a b c d
  a: 1^3 c256->64 @64^3   b: 3^3 c64->64 s1 @64^3
  c: 3^3 c128->128 s2 @64^3->32^3   d: conv2d baseline 3x3 c64->64 @(128,64,64)
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

rng = np.random.RandomState(0)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timeit(tag, fn, iters=10, warmup=2):
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


def conv_native(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride,) * 3, [(k.shape[0] // 2,) * 2] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def conv_mm(x, k):
    # 1x1x1 conv as a flat matmul.
    ci, co = k.shape[3], k.shape[4]
    y = x.reshape(-1, ci) @ k.reshape(ci, co)
    return y.reshape(x.shape[:4] + (co,))


def conv_d2d(x, k, stride=1):
    # 3^3 conv = sum over depth taps of a 2D 3x3 conv on (B*D, H, W, C).
    b, d, h, w, ci = x.shape
    co = k.shape[4]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    dout = (d + 2 * 1 - 3) // stride + 1
    acc = None
    for dz in range(3):
        xz = jax.lax.slice_in_dim(xp, dz, dz + (dout - 1) * stride + 1, stride, axis=1)
        x2 = xz.reshape(b * dout, h, w, ci)
        y2 = jax.lax.conv_general_dilated(
            x2, k[dz], (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        acc = y2 if acc is None else acc + y2
    ho, wo = acc.shape[1], acc.shape[2]
    return acc.reshape(b, dout, ho, wo, co)


def bench_pair(tag, f_ref, f_new, x, k, ct_shape):
    ct = jnp.asarray(rng.rand(*ct_shape).astype(np.float32))
    y_ref = jax.jit(f_ref)(x, k)
    y_new = jax.jit(f_new)(x, k)
    err = float(jnp.max(jnp.abs(y_ref - y_new)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    log(f"  {tag}: rel err {err:.2e}")

    for name, f in (("ref", f_ref), ("new", f_new)):
        fwd = jax.jit(f)
        timeit(f"{tag} {name} fwd", functools.partial(fwd, x, k))

        def vjp_run(x, k, ct, f=f):
            _, pull = jax.vjp(f, x, k)
            return pull(ct)

        g = jax.jit(vjp_run)
        timeit(f"{tag} {name} dx+dk", functools.partial(g, x, k, ct))


def main():
    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")

    which = sys.argv[1:] or ["a", "b", "c"]

    if "a" in which:
        log("=== a: 1^3 c256->64 @64^3 b2 ===")
        x = jnp.asarray(rng.rand(2, 64, 64, 64, 256).astype(np.float32))
        k = jnp.asarray((rng.rand(1, 1, 1, 256, 64) * 0.1).astype(np.float32))
        bench_pair("1x1 c256>64", conv_native, lambda x, k: conv_mm(x, k),
                   x, k, (2, 64, 64, 64, 64))

    if "b" in which:
        log("=== b: 3^3 c64->64 s1 @64^3 b2 ===")
        x = jnp.asarray(rng.rand(2, 64, 64, 64, 64).astype(np.float32))
        k = jnp.asarray((rng.rand(3, 3, 3, 64, 64) * 0.05).astype(np.float32))
        bench_pair("3x3 c64 s1", conv_native, conv_d2d,
                   x, k, (2, 64, 64, 64, 64))

    if "c" in which:
        log("=== c: 3^3 c128->128 s2 @64^3 b2 ===")
        x = jnp.asarray(rng.rand(2, 64, 64, 64, 128).astype(np.float32))
        k = jnp.asarray((rng.rand(3, 3, 3, 128, 128) * 0.05).astype(np.float32))
        bench_pair(
            "3x3 c128 s2",
            lambda x, k: conv_native(x, k, 2),
            lambda x, k: conv_d2d(x, k, 2),
            x, k, (2, 32, 32, 32, 128))

    if "d" in which:
        log("=== d: conv2d baseline 3x3 c64->64 @(128,64,64) ===")
        x2 = jnp.asarray(rng.rand(128, 64, 64, 64).astype(np.float32))
        k2 = jnp.asarray((rng.rand(3, 3, 64, 64) * 0.05).astype(np.float32))

        def c2(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        fwd = jax.jit(c2)
        timeit("conv2d fwd", functools.partial(fwd, x2, k2))
        ct = jnp.asarray(rng.rand(128, 64, 64, 64).astype(np.float32))

        def vjp_run(x, k, ct):
            _, pull = jax.vjp(c2, x, k)
            return pull(ct)

        g = jax.jit(vjp_run)
        timeit("conv2d dx+dk", functools.partial(g, x2, k2, ct))

    log("DONE")


if __name__ == "__main__":
    main()
