"""Fused short-sequence attention: softmax(q @ k^T) @ v in one VMEM pass.

Why: the Sformer's divided spatial attention runs 1024 independent
groups of ~1048 tokens at head dim 32 per layer
(`models/sformer.py::JointTokenAttention`; reference semantics
`/root/reference/models/NlosPoseSformer.py:95-151,174-183`).  XLA cannot
fuse a matmul output into another matmul's operand on TPU, so the naive
lowering materialises the f32 similarity tensor — ~4.4 GB per layer at
the realdata scale — to HBM, reads it back for the softmax, and again
for the attention-times-values contraction: the whole stage is
bandwidth-bound at ~1% MFU (round-4 realdata table: Sformer
2.2 captures/s vs heatmap 16.6).

At these shapes no flash-attention machinery (online softmax, k/v
streaming) is needed: one group's ENTIRE attention — q block, k, v, and
the similarity matrix — fits in VMEM with room to spare (~5 MB at
Lq_blk=1024, Lk=1152).  The kernel therefore just loads q/kT/v tiles,
runs both MXU contractions and the f32 softmax in registers/VMEM, and
writes the output: HBM traffic drops from ~15 GB to ~0.7 GB per layer.

Semantics: exactly ``softmax(q @ k^T, axis=-1) @ v`` with an f32 softmax
(matching `sformer.py::_attend`, which computes sim with
``preferred_element_type=f32``).  The caller applies the ``dh**-0.5``
query scale.  k is passed transposed host-side ((B, dh, Lk) — a cheap
XLA transpose of a small tensor) so both contractions are plain
(m, k) @ (k, n) MXU matmuls; Lk is lane-padded to 128 and masked with
-inf inside the kernel, so padding does not perturb the softmax.

Training still works: ``attend_fused`` carries a custom VJP whose
backward is the standard XLA attention gradient (materialises sim — the
hot realdata path is inference; revisit if Sformer training becomes a
measured bottleneck).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hiddenpose_tpu.ops.pallas.conv3p import on_tpu_default_device


def attend_ref(q, k, v):
    """The XLA formulation (sformer.py::_attend without the q scale)."""
    sim = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bij,bjd->bid", attn, v)


def attend_fused_supported(q_shape, k_shape) -> bool:
    """Eligibility: head dim a sublane multiple that fits lanes; k/v and a
    q-block's similarity tile must fit VMEM (Lk cap keeps kT+v+sim under
    ~6 MB so double-buffering has headroom)."""
    _, lq, dh = q_shape
    _, lk, _ = k_shape
    return (
        dh % 8 == 0 and dh <= 256 and lq % 8 == 0 and 8 <= lk <= 4096
    )


def _attn_kernel(q_ref, kt_ref, v_ref, o_ref, *, lk: int):
    from hiddenpose_tpu.ops.pallas.conv3p import kernel_dot_precision

    prec = kernel_dot_precision()  # Mosaic rejects an ambient HIGH
    q = q_ref[0]                       # (lq_blk, dh)
    kt = kt_ref[0]                     # (dh, lkp)
    sim = jnp.dot(q, kt, preferred_element_type=jnp.float32,
                  precision=prec)
    lane = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim = jnp.where(lane < lk, sim, -jnp.inf)
    m = jnp.max(sim, axis=1, keepdims=True)
    p = jnp.exp(sim - m)               # exp(-inf) = 0 on the pad lanes
    attn = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = jnp.dot(
        attn.astype(v_ref.dtype), v_ref[0],
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attend_fused_impl(q, k, v, interpret):
    b, lq, dh = q.shape
    lk = k.shape[1]
    lkp = -(-lk // 128) * 128
    kt = jnp.swapaxes(k, 1, 2)                       # (b, dh, lk)
    if lkp != lk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, lkp - lk)))
        v = jnp.pad(v, ((0, 0), (0, lkp - lk), (0, 0)))

    # Largest q block whose similarity tile stays comfortably in VMEM.
    blk = max(t for t in (1024, 512, 256, 128, 64, 32, 16, 8)
              if lq % t == 0 and t * lkp * 4 <= 6 * 1024 * 1024)

    kern = functools.partial(_attn_kernel, lk=lk)
    return pl.pallas_call(
        kern,
        grid=(b, lq // blk),           # lq innermost: kT/v stay resident
        in_specs=[
            pl.BlockSpec((1, blk, dh), lambda ib, iq: (ib, iq, 0)),
            pl.BlockSpec((1, dh, lkp), lambda ib, iq: (ib, 0, 0)),
            pl.BlockSpec((1, lkp, dh), lambda ib, iq: (ib, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, dh), lambda ib, iq: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq, dh), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lq * lk * dh,
            bytes_accessed=(q.size + kt.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=b * lq * lkp,
        ),
        interpret=interpret,
    )(q, kt, v)


@jax.custom_vjp
def attend_fused(q, k, v):
    """softmax(q @ k^T) @ v, fused in VMEM (see module docstring).

    q: (B, Lq, dh) — already scaled; k, v: (B, Lk, dh)."""
    return _attend_fused_impl(q, k, v, not on_tpu_default_device())


def _attend_fused_fwd(q, k, v):
    return attend_fused(q, k, v), (q, k, v)


def _attend_fused_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attend_ref, q, k, v)
    return vjp(g)


attend_fused.defvjp(_attend_fused_fwd, _attend_fused_bwd)


def attn_route() -> str:
    """'' (XLA _attend) | 'fused'.  Default: fused on a real TPU backend,
    XLA elsewhere (interpret-mode Pallas would slow CPU CI for nothing);
    HP_SFORMER_ATTN=fused|off forces either way."""
    env = os.environ.get("HP_SFORMER_ATTN", "")
    if env == "off":
        return ""
    if env == "fused":
        return "fused"
    return "fused" if on_tpu_default_device() else ""
