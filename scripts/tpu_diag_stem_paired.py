"""Isolate the paired-lane stem kernel's on-chip 2.3e-3 error.

Interpret mode is exact, so one of the Mosaic-lowered ops that is NEW in
the paired path (vs the proven unpaired kernel) must mis-lower:

  A. the im2col store: partial-sublane (offset 0/4, extent 4) +
     partial-lane (offset 0/64, extent 64) masked store into a 3D VMEM
     scratch, from a source sliced at lane offset aw / sublane offset ah
     of a 4D tile;
  B. the epilogue: offset-lane read out[:, 64:128] of a matmul result
     followed by a 2D transpose;
  C. the f32 MXU matmul itself at N=128 (precision control).

Each check is its own tiny pallas_call (no manual DMA — low fault risk),
compared against numpy.  Prints max abs err per check; exits 0 always so
every check runs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


CIN, TD, TH, KS = 8, 4, 4, 5
NC = TD // 2 * TH  # 8 paired columns


def check_a():
    """Paired im2col store pattern: x_tile (8, 8, 8, 128) -> patches
    (64, 8, 128): rows = (tap-ish {ah, aw}, cin) to keep it small."""
    def kern(x_ref, o_ref, patches):
        for ah in range(2):          # stand-in for the 5x5x5 tap loops
            for aw in range(5):
                off = (ah * 5 + aw) * CIN
                for dd in range(TD):
                    d2, lsb = dd // 2, dd % 2
                    patches[
                        off:off + CIN, d2 * TH:(d2 + 1) * TH,
                        lsb * 64:(lsb + 1) * 64,
                    ] = x_ref[:, ah + dd, ah:ah + TH, aw:aw + 64]
        o_ref[:, :, :] = patches[:, :, :]

    x = np.random.RandomState(0).rand(CIN, TD + 4, TH + 4, 128).astype(
        np.float32)
    got = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((80, NC, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((80, NC, 128), jnp.float32)],
    )(jnp.asarray(x))
    got = np.asarray(jax.device_get(got))

    want = np.zeros((80, NC, 128), np.float32)
    for ah in range(2):
        for aw in range(5):
            off = (ah * 5 + aw) * CIN
            for dd in range(TD):
                d2, lsb = dd // 2, dd % 2
                want[off:off + CIN, d2 * TH:(d2 + 1) * TH,
                     lsb * 64:(lsb + 1) * 64] = \
                    x[:, ah + dd, ah:ah + TH, aw:aw + 64]
    err = np.abs(got - want).max()
    log(f"A im2col store: max abs err {err:.3e}"
        + ("  <-- CULPRIT" if err > 1e-6 else ""))
    if err > 1e-6:
        bad = np.argwhere(np.abs(got - want) > 1e-6)
        log(f"  {len(bad)} bad elements; first 5: {bad[:5].tolist()}")


def check_b():
    """Offset-lane read + transpose: in (512, 128) -> two (64, 512)."""
    def kern(x_ref, o1_ref, o2_ref):
        v = x_ref[:, :]
        o1_ref[:, :] = v[:, 0:64].T
        o2_ref[:, :] = v[:, 64:128].T

    x = np.random.RandomState(1).rand(512, 128).astype(np.float32)
    o1, o2 = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((64, 512), jnp.float32)] * 2,
    )(jnp.asarray(x))
    e1 = np.abs(np.asarray(jax.device_get(o1)) - x[:, 0:64].T).max()
    e2 = np.abs(np.asarray(jax.device_get(o2)) - x[:, 64:128].T).max()
    log(f"B slice+transpose: lo {e1:.3e} hi {e2:.3e}"
        + ("  <-- CULPRIT" if max(e1, e2) > 1e-6 else ""))


def check_c():
    """f32 matmul (512, 1024) @ (1024, 128) in-kernel vs XLA HIGHEST."""
    rng = np.random.RandomState(2)
    a = (rng.randn(512, 1024) * 0.1).astype(np.float32)
    bm = rng.rand(1024, 128).astype(np.float32)

    def kern(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.float32)

    got = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
    )(jnp.asarray(a), jnp.asarray(bm))
    want = jax.jit(lambda x, y: jax.lax.dot(
        x, y, precision=jax.lax.Precision.HIGHEST))(
        jnp.asarray(a), jnp.asarray(bm))
    got = np.asarray(jax.device_get(got))
    want = np.asarray(jax.device_get(want))
    rel = np.abs(got - want).max() / np.abs(want).max()
    log(f"C f32 dot N=128: rel err {rel:.3e}"
        + ("  <-- CULPRIT (precision)" if rel > 1e-5 else ""))

    # same at N=64 (the proven unpaired shape), for contrast
    def kern64(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.float32)

    got64 = pl.pallas_call(
        kern64, out_shape=jax.ShapeDtypeStruct((512, 64), jnp.float32),
    )(jnp.asarray(a), jnp.asarray(bm[:, :64]))
    want64 = jax.jit(lambda x, y: jax.lax.dot(
        x, y, precision=jax.lax.Precision.HIGHEST))(
        jnp.asarray(a), jnp.asarray(bm[:, :64]))
    rel64 = (np.abs(np.asarray(jax.device_get(got64))
                    - np.asarray(jax.device_get(want64))).max()
             / np.abs(np.asarray(jax.device_get(want64))).max())
    log(f"C f32 dot N=64 : rel err {rel64:.3e}")


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    for name, fn in (("A", check_a), ("B", check_b), ("C", check_c)):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — print and keep going
            log(f"{name} FAILED TO RUN: {type(e).__name__}: {e}")
    log("diag done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
