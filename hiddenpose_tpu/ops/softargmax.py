"""Soft-argmax joint decoding from 3D heatmaps.

Re-design of `/root/reference/utils/criterion.py:96-153`
(``softmax_integral_tensor`` / ``generate_3d_integral_preds_tensor``):
global softmax over each joint's flattened heatmap, then the expected
coordinate along each axis via marginal sums.

Parity notes:
* The live reference does NOT re-centre coordinates to [-0.5, 0.5] (the
  normalisation is commented out at `utils/criterion.py:142-144`), so outputs
  are in heatmap-voxel units 0..dim — matching the dataloader's joint scaling
  (`utils/nlos_pose_dataloader.py:132-144`).  Preserved here.
* The reference's `torch.cuda.comm.broadcast` (`utils/criterion.py:118-120`)
  is just device placement of an arange; in JAX this is a device-resident
  iota.
* Axis semantics: heatmaps are (B, J, Z, Y, X); "x" is the expected X (last
  axis) coordinate, "y" the Y, "z" the Z, concatenated as (x, y, z) triplets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_integral(heatmaps: jax.Array, num_joints: int) -> jax.Array:
    """(B, J, Z, Y, X) logits -> (B, J*3) expected (x, y, z) coordinates."""
    b = heatmaps.shape[0]
    z_dim, y_dim, x_dim = heatmaps.shape[-3:]
    # Softmax + expectation in float32 regardless of compute dtype — the
    # expected-coordinate sum is cancellation-sensitive.
    flat = heatmaps.reshape(b, num_joints, -1).astype(jnp.float32)
    probs = jax.nn.softmax(flat, axis=2).reshape(
        b, num_joints, z_dim, y_dim, x_dim
    )

    # Marginals (utils/criterion.py:111-116).
    marg_x = probs.sum(axis=(2, 3))  # over z, y -> (B, J, X)
    marg_y = probs.sum(axis=(2, 4))  # over z, x -> (B, J, Y)
    marg_z = probs.sum(axis=(3, 4))  # over y, x -> (B, J, Z)

    f32 = heatmaps.dtype if heatmaps.dtype == jnp.float64 else jnp.float32
    x = (marg_x * jnp.arange(x_dim, dtype=f32)).sum(axis=2)
    y = (marg_y * jnp.arange(y_dim, dtype=f32)).sum(axis=2)
    z = (marg_z * jnp.arange(z_dim, dtype=f32)).sum(axis=2)

    return jnp.stack([x, y, z], axis=2).reshape(b, num_joints * 3)


def simdr_decode(
    logits_xyz: jax.Array, split_ratio: float = 2.0
) -> jax.Array:
    """Decode per-axis SimDR classification logits to coordinates.

    logits_xyz: (B, J, 3, K) — per-axis bin logits (the first three p-slots
    of NlosPoseSformer's output, `models/NlosPoseSformer.py:143-151`).
    Returns (B, J, 3) expected coordinates in image units (bin / split_ratio,
    inverting the dataloader's mu = joint * split_ratio at
    `utils/dataloader.py:271-273`).
    """
    probs = jax.nn.softmax(logits_xyz.astype(jnp.float32), axis=-1)
    k = logits_xyz.shape[-1]
    bins = jnp.arange(k, dtype=jnp.float32)
    expected = (probs * bins).sum(axis=-1)
    return expected / split_ratio


def softmax_integral_normalized(heatmaps: jax.Array, num_joints: int) -> jax.Array:
    """Variant that re-centres to [-0.5, 0.5] — the semantics of the
    reference's *older* loss copy (`models/critierion.py:134-149`).  Provided
    for completeness; do not mix with the live joint scaling."""
    z_dim, y_dim, x_dim = heatmaps.shape[-3:]
    coords = softmax_integral(heatmaps, num_joints)
    coords = coords.reshape(coords.shape[0], num_joints, 3)
    dims = jnp.asarray([x_dim, y_dim, z_dim], dtype=coords.dtype)
    coords = coords / dims - 0.5
    return coords.reshape(coords.shape[0], num_joints * 3)
