"""Fine-grained TPU perf probes for the hot stages (round-2 optimization).

Usage: python scripts/perf_probe.py <probe> [...]
Probes: posenet_parts | unet_parts | fe_parts | conv_variants

Timing discipline matches bench.py: device→host fetch as the fence (the
axon relay's block_until_ready is a no-op); arrays passed as jit ARGUMENTS
(closures inflate the remote-compile request → HTTP 413).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("HP_PROBE_ITERS", "10"))
B = int(os.environ.get("HP_PROBE_BATCH", "2"))
S = int(os.environ.get("HP_PROBE_SIZE", "128"))


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timeit(name, f, *args, iters=ITERS):
    jf = jax.jit(f)
    _sync(jf(*args))
    _sync(jf(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"  {name}: {ms:.2f} ms", flush=True)
    return ms


def rnd(*shape):
    return jnp.asarray(np.random.RandomState(0).rand(*shape).astype(np.float32))


def posenet_parts():
    from hiddenpose_tpu.models.posenet3d import DeconvHead, PoseNet3D, StemS2D

    x = rnd(B, S, S, S, 1)
    stem = StemS2D(features=64)
    sv = jax.jit(stem.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)))
    timeit("stem_s2d(xla)", stem.apply, sv, x)

    stem_p = StemS2D(features=64, use_pallas=True)
    timeit("stem_s2d(pallas)", stem_p.apply, sv, x)

    # Residual stages: feed the pooled activation through layers only.
    class StagesOnly(PoseNet3D):
        pass

    pn = PoseNet3D(num_joints=24)
    pv = jax.jit(lambda r, xx: pn.init(r, xx, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1))
    )
    timeit("posenet_full", lambda v, xx: pn.apply(v, xx, train=False), pv, x)

    # Head alone at its real input size (S/16)^3 x 2048.
    h = rnd(B, S // 16, S // 16, S // 16, 2048)
    head = DeconvHead(num_joints=24)
    hv = jax.jit(lambda r, xx: head.init(r, xx, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4, 2048))
    )
    timeit("head_deconv", lambda v, xx: head.apply(v, xx, train=False), hv, h)


def unet_parts():
    from hiddenpose_tpu.models.unet3d import DoubleConv, UNet3d

    x = rnd(B, S, S, S, 1)
    un = UNet3d(in_channels=1, n_channels=4)
    uv = jax.jit(un.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)))
    timeit("unet_full", un.apply, uv, x)

    for c_in, feat, size, tag in [
        (1, 4, S, "top_enc"),
        (8, 4, S, "top_dec"),
        (4, 8, S // 2, "lvl2"),
        (8, 16, S // 4, "lvl3"),
    ]:
        xx = rnd(B, size, size, size, c_in)
        dc = DoubleConv(feat)
        dv = jax.jit(dc.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, c_in))
        )
        timeit(f"doubleconv_{tag}_{size}^3_c{c_in}->{feat}", dc.apply, dv, xx)


def fe_parts():
    from hiddenpose_tpu.models.blocks import FeatureExtraction, ResConv3D

    x = rnd(B, S, S, S, 1)
    fe = FeatureExtraction(basedim=1, stride=1)
    fv = jax.jit(fe.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)))
    timeit("fe_full", fe.apply, fv, x)

    rc = ResConv3D(1)
    rv = jax.jit(rc.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    timeit("resconv3d_c1", rc.apply, rv, x)


def conv_variants():
    """Raw conv timing: XLA native vs channel counts at full res."""
    for c_in, c_out in [(1, 1), (1, 4), (4, 4), (8, 4), (8, 8)]:
        x = rnd(B, S, S, S, c_in)
        k = rnd(3, 3, 3, c_in, c_out)
        timeit(
            f"xla_conv3_{c_in}->{c_out}",
            lambda xx, kk: jax.lax.conv_general_dilated(
                xx, kk, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            ),
            x, k,
        )
    # planes-layout pad cost reference
    xp = rnd(B, 4, S, S, S)
    timeit("pad_planes_c4", lambda xx: jnp.pad(
        xx, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1))), xp)
    timeit("transpose_last_to_planes_c4",
           lambda xx: jnp.transpose(xx, (0, 4, 1, 2, 3)), rnd(B, S, S, S, 4))




def conv_reformulations():
    """XLA-level alternatives for the small-channel 3^3 conv @128^3."""
    c_in, c_out = 4, 4
    x = rnd(B, S, S, S, c_in)
    k = rnd(3, 3, 3, c_in, c_out)

    def conv_ndhwc(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
    timeit("ndhwc_4->4", conv_ndhwc, x, k)

    xp = rnd(B, c_in, S, S, S)
    def conv_ncdhw(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
            preferred_element_type=jnp.float32)
    timeit("ncdhw_4->4", conv_ncdhw, xp, k)

    def conv_2d_sum(xx, kk):
        # 3 x conv2d over (H, W) with D-shifted inputs; batch folds D.
        b, d, h, w, ci = xx.shape
        xpad = jnp.pad(xx, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        acc = None
        for dd in range(3):
            xs = xpad[:, dd:dd + d].reshape(b * d, h, w, ci)
            y = jax.lax.conv_general_dilated(
                xs, kk[dd], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return acc.reshape(b, d, h, w, -1)
    timeit("conv2d_sum_4->4", conv_2d_sum, x, k)

    def conv_1d_w_sum(xx, kk):
        # decompose to 9 x 1D convs along W only (taps d,h via shifts)
        b, d, h, w, ci = xx.shape
        xpad = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        acc = None
        for dd in range(3):
            for hh in range(3):
                xs = xpad[:, dd:dd + d, hh:hh + h].reshape(b * d * h, w, ci)
                y = jax.lax.conv_general_dilated(
                    xs, kk[dd, hh], (1,), "SAME",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
        return acc.reshape(b, d, h, w, -1)
    timeit("conv1dW_sum_4->4", conv_1d_w_sum, x, k)

    def conv_shift_einsum(xx, kk):
        # 27 shifted slices contracted via einsum (VPU/MXU choice to XLA)
        b, d, h, w, ci = xx.shape
        xpad = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dd in range(3):
            for hh in range(3):
                for ww in range(3):
                    xs = xpad[:, dd:dd + d, hh:hh + h, ww:ww + w]
                    y = jnp.einsum("bdhwc,co->bdhwo", xs, kk[dd, hh, ww],
                                   preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
        return acc
    timeit("shift_einsum_4->4", conv_shift_einsum, x, k)

    xb = x.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    timeit("ndhwc_4->4_bf16", conv_ndhwc, xb, kb)

    c1 = rnd(B, S, S, S, 1)
    k1 = rnd(3, 3, 3, 1, 1)
    timeit("shift_einsum_1->1", conv_shift_einsum, c1, k1)
    timeit("conv2d_sum_1->1", conv_2d_sum, c1, k1)


if __name__ == "__main__":
    probe = sys.argv[1] if len(sys.argv) > 1 else "posenet_parts"
    print(f"probe={probe} B={B} S={S} iters={ITERS}", flush=True)
    globals()[probe]()
