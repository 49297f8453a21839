"""On-chip validation + timing for the paired-lane stem kernel.

The tpu_diag_stem_paired hardware bisection (round 3) showed the paired
path's 2.3e-3 rel err vs XLA-HIGHEST is NOT a mis-lowering: the im2col
store (A) and offset-lane transpose epilogue (B) are exact on-chip, while
the in-kernel f32 `jnp.dot` itself measures ~2.5e-3 vs HIGHEST at BOTH
N=64 (the proven unpaired shape) and N=128 — i.e. the default-precision
MXU runs bf16 passes, exactly like every XLA conv in the network.  The
paired kernel merely rounds in a different order.

This script pins the acceptance numbers on the production shape:
  1. paired vs unpaired vs XLA default-precision conv (rel err; expect
     ~1e-3 between each other, 0 between unpaired and XLA-default);
  2. kernel timing paired vs unpaired (expect ~2x on the matmul section);
  3. e2e inference b2 with paired on.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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


def rel(a, b):
    a = np.asarray(jax.device_get(a), np.float32)
    b = np.asarray(jax.device_get(b), np.float32)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def main():
    from hiddenpose_tpu.ops.pallas.stem_conv import stem_conv_raw_pallas
    from hiddenpose_tpu.ops.space_to_depth import (
        make_s2d_kernel, space_to_depth_3d,
    )

    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")

    rng = np.random.RandomState(0)
    B, S, F = 2, 128, 64
    x = jnp.asarray(rng.rand(B, S, S, S, 1).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, 7, 1, F) * 0.05).astype(np.float32))
    k2 = make_s2d_kernel(k)
    scale = jnp.asarray(rng.rand(F * 8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(F * 8).astype(np.float32) * 0.1)

    @jax.jit
    def xla_default(x, k2, scale, bias):
        x2 = space_to_depth_3d(x)
        y2 = jax.lax.conv_general_dilated(
            x2, k2, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y2 * scale + bias, 0.0)

    log("=== correctness (production shape 128^3 b2) ===")
    y_xla = xla_default(x, k2, scale, bias)
    y_unp = stem_conv_raw_pallas(x, k2, scale, bias, relu=True, paired=False)
    y_par = stem_conv_raw_pallas(x, k2, scale, bias, relu=True, paired=True)
    log(f"  unpaired vs XLA-default: rel {rel(y_unp, y_xla):.3e}")
    log(f"  paired   vs XLA-default: rel {rel(y_par, y_xla):.3e}")
    log(f"  paired   vs unpaired:    rel {rel(y_par, y_unp):.3e}")

    log("=== timing ===")
    timeit("stem unpaired", lambda: stem_conv_raw_pallas(
        x, k2, scale, bias, relu=True, paired=False))
    timeit("stem paired  ", lambda: stem_conv_raw_pallas(
        x, k2, scale, bias, relu=True, paired=True))

    log("=== e2e inference b2, paired on ===")
    os.environ["HP_STEM_PAIRED"] = "1"
    from hiddenpose_tpu.config import default_config
    from hiddenpose_tpu.models.nlospose import build_nlospose

    cfg = default_config().preset_t128()
    model, lct = build_nlospose(cfg.model)
    meas = jnp.asarray(rng.rand(2, 1, 128, 128, 128).astype(np.float32))
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(410), meas[:1])

    fwd = jax.jit(lambda v, m: model.apply(v, m, lct, train=False))
    dt = timeit("e2e fwd b2 paired", lambda: fwd(variables, meas))
    log(f"  => {2.0 / dt:.1f} vol/s")
    log("DONE")


if __name__ == "__main__":
    main()
