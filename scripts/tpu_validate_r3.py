"""Round-3 on-chip kernel validation (run on the TPU relay, one process).

Validates, in increasing order of risk (a Mosaic fault costs a ~4-5 min
worker recovery, so each step prints BEFORE it runs):
  1. forward conv3p at W=128 (regression: the 4D-ref rewrite)
  2. forward conv3p at W=64 / W=32 (new: sub-128-lane hardware kernels)
  3. adjoint kernel + full custom-VJP grads at W=128 and W=64
  4. paired-lane stem kernel at w2=64 (the production width)

Each check compares against XLA at Precision.HIGHEST.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def fetch(x):
    return np.asarray(jax.device_get(x))


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    # health check
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(fetch((a @ a))[0, 0])}")

    from hiddenpose_tpu.ops.pallas.conv3p import (
        conv3_planes,
        conv3_planes_diff,
        conv3_planes_xla,
    )

    rng = np.random.RandomState(0)

    def case(cin, cout, d, h, w, act, pad, res=True, bias=True):
        x = jnp.asarray(rng.randn(2, cin, d, h, w).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * .2)
        b = jnp.asarray(rng.randn(cout).astype(np.float32)) if bias else None
        r = (jnp.asarray(rng.randn(2, cout, d, h, w).astype(np.float32))
             if res else None)
        return x, k, b, r

    def check_fwd(tag, cin, cout, d, h, w, act, pad, res=True):
        log(f"fwd {tag}: cin={cin} cout={cout} {d}x{h}x{w} {act}/{pad}")
        x, k, b, r = case(cin, cout, d, h, w, act, pad, res)
        got = fetch(conv3_planes(x, k, b, r, act=act, pad_mode=pad,
                                 interpret=False))
        want = fetch(conv3_planes_xla(x, k, b, r, act=act, pad_mode=pad))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        log(f"  rel err {err:.2e}")
        assert err < 1e-5, (tag, err)

    def check_grads(tag, cin, cout, d, h, w, act, pad, res=True):
        log(f"grad {tag}: cin={cin} cout={cout} {d}x{h}x{w} {act}/{pad}")
        x, k, b, r = case(cin, cout, d, h, w, act, pad, res)
        cot = jnp.asarray(rng.randn(2, cout, d, h, w).astype(np.float32))

        def f_p(x, k, b, r):
            return jnp.sum(conv3_planes_diff(
                x, k, b, r, act=act, pad_mode=pad, interpret=False) * cot)

        def f_x(x, k, b, r):
            return jnp.sum(conv3_planes_xla(
                x, k, b, r, act=act, pad_mode=pad) * cot)

        gp = jax.jit(jax.grad(f_p, argnums=(0, 1, 2)))(x, k, b, r)
        gx = jax.jit(jax.grad(f_x, argnums=(0, 1, 2)))(x, k, b, r)
        for name, a_, b_ in zip(("dx", "dk", "db"), gp, gx):
            a_, b_ = fetch(a_), fetch(b_)
            err = np.abs(a_ - b_).max() / (np.abs(b_).max() + 1e-9)
            log(f"  {name} rel err {err:.2e}")
            # dk rides XLA's default-precision conv transpose (bf16 MXU
            # passes, ~0.2-0.4% — same precision the all-XLA train path
            # always had); dx/db are exact-f32 Pallas/reduce.
            tol = 5e-3 if name == "dk" else 2e-4
            assert err < tol, (tag, name, err)

    # 1. W=128 regression (the production shape round 2 shipped)
    check_fwd("w128", 1, 4, 16, 16, 128, "leaky", "edge")
    # 2. sub-128 lanes (new)
    check_fwd("w64", 1, 4, 16, 16, 64, "leaky", "edge")
    check_fwd("w64-zero", 4, 8, 16, 16, 64, "relu", "zero", res=False)
    check_fwd("w32", 4, 8, 16, 32, 32, "none", "zero", res=False)
    # 3. custom-VJP grads on-chip
    check_grads("w128", 1, 4, 16, 16, 128, "leaky", "edge")
    check_grads("w64", 2, 4, 16, 16, 64, "relu", "zero")

    # 4. paired-lane stem
    from hiddenpose_tpu.ops.pallas.stem_conv import stem_conv_s2d_pallas
    from hiddenpose_tpu.ops.space_to_depth import (
        make_s2d_kernel,
        space_to_depth_3d,
    )

    log("stem paired-lane w2=64")
    x2 = space_to_depth_3d(
        jnp.asarray(rng.rand(1, 32, 32, 128, 1).astype(np.float32))
    )
    k2 = make_s2d_kernel(
        jnp.asarray((rng.randn(7, 7, 7, 1, 64) * 0.1).astype(np.float32))
    )
    scale = jnp.asarray((rng.rand(512) + 0.5).astype(np.float32))
    bias = jnp.asarray((rng.randn(512) * 0.1).astype(np.float32))
    got = fetch(stem_conv_s2d_pallas(x2, k2, scale, bias, relu=True))
    want = jax.lax.conv_general_dilated(
        x2, k2, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    want = fetch(jnp.maximum(want * scale + bias, 0.0))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    log(f"  stem rel err {err:.2e}")
    assert err < 1e-5, err

    log("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
