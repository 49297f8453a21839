"""Round-3 training diagnostics, part 2: the full-step residual and the
PoseNet stack.

  step    full train step vs ablations (no losses / no optimizer /
          joint-loss only) — what do softargmax+BCE-dice+optax cost?
  stack   per-stage fwd+bwd of the PoseNet body at REAL shapes
          (stem out 64^3 x64 -> layer1..4 -> head at 8^3 x2048).
  stem2   the s2d stem conv and phase-BN in isolation (train mode).

Usage: python scripts/tpu_diag_train2.py step stack stem2
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


def group_step():
    from hiddenpose_tpu.config import default_config
    from hiddenpose_tpu.losses import bce_dice_loss, l2_joint_location_loss
    from hiddenpose_tpu.models.nlospose import build_nlospose
    from hiddenpose_tpu.train.optim import make_optimizer
    from hiddenpose_tpu.train.state import TrainState
    from hiddenpose_tpu.train.step import make_train_step

    size, batch = 128, 2
    cfg = default_config().preset_t128()
    model, lct = build_nlospose(cfg.model)
    meas = jnp.asarray(rng.rand(batch, 1, size, size, size).astype(np.float32))
    variables = jax.jit(
        lambda r, m: model.init(r, m, lct, train=False)
    )(jax.random.PRNGKey(410), meas[:1])
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    h = size // 2
    batch_data = {
        "meas": meas,
        "vol": jnp.asarray(
            (rng.rand(batch, 1, size, size, size) > 0.5).astype(np.float32)),
        "joints": jnp.asarray((rng.rand(batch, 72) * h).astype(np.float32)),
        "joints_vis": jnp.ones((batch, 72), jnp.float32),
    }

    step_fn = make_train_step(model, donate=False)
    timeit("full train step", lambda: step_fn(state, batch_data, lct)[1])

    def grads_only(loss_body):
        def loss_fn(params):
            (heatmaps, refine), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch_data["meas"], lct, train=True, mutable=["batch_stats"],
            )
            return loss_body(heatmaps, refine), 0.0

        def run(params):
            (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads

        return jax.jit(run)

    f_sum = grads_only(lambda hm, rf: jnp.sum(hm ** 2) + jnp.sum(rf ** 2))
    timeit("grads, sum-loss (no losses)", lambda: f_sum(state.params))

    f_real = grads_only(lambda hm, rf: (
        l2_joint_location_loss(hm, batch_data["joints"],
                               batch_data["joints_vis"])
        + bce_dice_loss(rf.reshape(batch, -1),
                        batch_data["vol"].reshape(batch, -1))))
    timeit("grads, real losses (no optax)", lambda: f_real(state.params))

    f_joint = grads_only(lambda hm, rf: l2_joint_location_loss(
        hm, batch_data["joints"], batch_data["joints_vis"]) + 0.0 * jnp.sum(rf))
    timeit("grads, joint-loss only", lambda: f_joint(state.params))

    # optax apply alone
    def apply_only(state, grads):
        return state.apply_gradients(grads, state.batch_stats)

    g0 = f_sum(state.params)
    ap = jax.jit(apply_only)
    timeit("optax apply_gradients", lambda: ap(state, g0))


def _stage_probe(tag, mod, x, has_bn=True):
    v = jax.jit(lambda r, x: mod.init(r, x, train=True) if has_bn
                else mod.init(r, x))(jax.random.PRNGKey(0), x)

    def loss(p, x):
        if has_bn:
            out, _ = mod.apply(
                {"params": p, "batch_stats": v.get("batch_stats", {})}, x,
                train=True, mutable=["batch_stats"])
        else:
            out = mod.apply({"params": p}, x)
        return jnp.sum(out ** 2)

    timeit(f"{tag} fwd", lambda: jax.jit(loss)(v["params"], x))
    g = jax.jit(jax.grad(loss))
    timeit(f"{tag} grad", lambda: g(v["params"], x))


def group_stack():
    import flax.linen as nn

    from hiddenpose_tpu.models.posenet3d import Bottleneck, DeconvHead

    class Stage(nn.Module):
        planes: int
        blocks: int
        stride: int
        in_expanded: bool  # input already planes*4 channels?
        train: bool = True

        @nn.compact
        def __call__(self, x, train=True):
            block = nn.remat(Bottleneck)
            for b in range(self.blocks):
                s = self.stride if b == 0 else 1
                proj = b == 0
                x = block(planes=self.planes, stride=s, use_projection=proj,
                          train=True, name=f"b{b}")(x)
            return x

    shapes = [
        ("layer1 64^3", Stage(planes=64, blocks=3, stride=1, in_expanded=False),
         (2, 64, 64, 64, 64)),
        ("layer2 ->32^3", Stage(planes=128, blocks=4, stride=2, in_expanded=True),
         (2, 64, 64, 64, 256)),
        ("layer3 ->16^3", Stage(planes=256, blocks=6, stride=2, in_expanded=True),
         (2, 32, 32, 32, 512)),
        ("layer4 ->8^3", Stage(planes=512, blocks=3, stride=2, in_expanded=True),
         (2, 16, 16, 16, 1024)),
    ]
    for tag, mod, shp in shapes:
        x = jnp.asarray(rng.randn(*shp).astype(np.float32) * 0.1)
        log(f"{tag}:")
        _stage_probe(tag, mod, x)

    log("head 8^3 (real shape):")
    hx = jnp.asarray(rng.randn(2, 8, 8, 8, 2048).astype(np.float32) * 0.1)
    _stage_probe("head", DeconvHead(), hx)


def group_stem2():
    from hiddenpose_tpu.ops.space_to_depth import (
        make_s2d_kernel,
        space_to_depth_3d,
    )

    x = jnp.asarray(rng.rand(2, 128, 128, 128, 1).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, 7, 1, 64) * 0.1).astype(np.float32))

    def conv(k, x):
        x2 = space_to_depth_3d(x)
        k2 = make_s2d_kernel(k)
        return jax.lax.conv_general_dilated(
            x2, k2, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )

    log("stem s2d conv (2, 128^3, 1) -> (64^3, 512):")
    f = jax.jit(conv)
    timeit("fwd", lambda: f(k, x))
    g = jax.jit(jax.grad(lambda k, x: jnp.sum(conv(k, x) ** 2),
                         argnums=(0, 1)))
    timeit("grad (dk+dx)", lambda: g(k, x))

    log("phase BN train (2, 64^3, 512):")
    y2 = jnp.asarray(rng.randn(2, 64, 64, 64, 512).astype(np.float32))
    gamma = jnp.ones((64,)) * 1.1
    beta = jnp.zeros((64,))

    def bn(y2, gamma, beta):
        flat = y2.reshape(-1, 8, 64)
        mean = flat.mean(axis=(0, 1))
        var = flat.var(axis=(0, 1))
        scale = gamma * jax.lax.rsqrt(var + 1e-5)
        shift = beta - mean * scale
        return jnp.maximum(y2 * jnp.tile(scale, 8) + jnp.tile(shift, 8), 0.0)

    fb = jax.jit(bn)
    timeit("fwd", lambda: fb(y2, gamma, beta))
    gb = jax.jit(jax.grad(
        lambda y2, g_, b_: jnp.sum(bn(y2, g_, b_) ** 2), argnums=(0, 1, 2)))
    timeit("grad", lambda: gb(y2, gamma, beta))


GROUPS = {"step": group_step, "stack": group_stack, "stem2": group_stem2}


def main():
    log(f"backend={jax.default_backend()}")
    a = jnp.ones((128, 128))
    log(f"health matmul: {float(np.asarray(a @ a)[0, 0])}")
    for name in (sys.argv[1:] or list(GROUPS)):
        log(f"=== group {name} ===")
        GROUPS[name]()
    log("DONE")


if __name__ == "__main__":
    main()
