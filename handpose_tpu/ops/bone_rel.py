"""Bone-relative (kinematic-chain) coordinate transform and its inverse.

TPU-native redesign of reference utils/relative_trafo.py:89-271.  The
reference iterates a python list of 21 nodes building 4x4 homogeneous
matrices and calling ``torch.inverse``.  Here:

* transforms are stored as affine pairs ``(R (..,3,3), t (..,3))`` --
  the inverse of a rigid transform is the transpose, no ``inverse`` calls;
* the five finger chains are structurally identical, so they are stacked on
  a "finger" axis and advanced with a single ``lax.scan`` over chain depth
  (3 steps), turning the reference's 21-iteration python loop into 1 + 3
  batched steps of (B*5)-wide math.

Kinematic chain (reference utils/relative_trafo.py:131-164):
  node 0 hangs off the root; each finger chain runs root -> 4 -> 3 -> 2 -> 1
  (and +4 offsets for the other fingers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import rot_mat_x, rot_mat_y

# Finger chains in evaluation order (root-side first).
FINGER_CHAINS = ((4, 3, 2, 1),
                 (8, 7, 6, 5),
                 (12, 11, 10, 9),
                 (16, 15, 14, 13),
                 (20, 19, 18, 17))
ROOT_CHILDREN = (0, 4, 8, 12, 16, 20)


def _backward_step(delta, R_T):
    """One articulation extraction: bone vector in parent-local frame.

    Args:
      delta: (..., 3) bone vector already mapped into the parent frame.
      R_T:   (..., 3, 3) rotation part of the global->local transform.
    Returns:
      (length, angle_x, angle_y), (R_new, t_delta) where the new transform's
      translation contribution is ``t_new = R_this @ t_T + t_this`` handled
      by the caller (t_this = (0,0,-length)).
    """
    length = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    # reference _atan2(y, x) = atan2(y, x + 1e-8)  (relative_trafo.py:30-35)
    angle_y = jnp.arctan2(delta[..., 0], delta[..., 2] + 1e-8)
    tmp = jnp.einsum("...ij,...j->...i", rot_mat_y(-angle_y), delta)
    angle_x = jnp.arctan2(-tmp[..., 1], tmp[..., 2] + 1e-8)
    R_this = rot_mat_x(-angle_x) @ rot_mat_y(-angle_y)
    return (length, angle_x, angle_y), R_this


def _compose(R_this, t_this, R_T, t_T):
    """(R_this, t_this) ∘ (R_T, t_T):  x -> R_this (R_T x + t_T) + t_this."""
    R_new = R_this @ R_T
    t_new = jnp.einsum("...ij,...j->...i", R_this, t_T) + t_this
    return R_new, t_new


def _z_trans(length):
    z = jnp.zeros_like(length)
    return jnp.stack([z, z, -length], axis=-1)


def bone_rel_trafo(coords_xyz: jnp.ndarray) -> jnp.ndarray:
    """(B, 21, 3) xyz -> (B, 21, 3) of [length, angle_x, angle_y] per bone.

    Matches reference utils/relative_trafo.py:167-218.
    """
    coords = coords_xyz.reshape(-1, 21, 3)
    B = coords.shape[0]
    out = jnp.zeros((B, 21, 3), coords.dtype)

    # All six root children start from the identity transform; their bone
    # vector is the global coordinate itself.
    root_ids = jnp.array(ROOT_CHILDREN)
    delta0 = coords[:, root_ids, :]                      # (B, 6, 3)
    (l0, ax0, ay0), R0 = _backward_step(delta0, None)
    out = out.at[:, root_ids, :].set(jnp.stack([l0, ax0, ay0], axis=-1))

    # Finger chains: keep (R, t) per finger, scan over depth 1..3.
    chains = jnp.array(FINGER_CHAINS)                     # (5, 4)
    R = R0[:, 1:, :, :]                                   # (B, 5, 3, 3) skip node 0
    t = _z_trans(l0[:, 1:])                               # (B, 5, 3)

    child_ids = chains[:, 1:].T                           # (3, 5) per-depth children
    parent_ids = chains[:, :-1].T                         # (3, 5) per-depth parents

    def step(carry, ids):
        R_T, t_T = carry
        child, parent = ids
        delta_g = coords[:, child, :] - coords[:, parent, :]   # (B, 5, 3)
        delta = jnp.einsum("bfij,bfj->bfi", R_T, delta_g)
        (l, ax, ay), R_this = _backward_step(delta, R_T)
        R_new, t_new = _compose(R_this, _z_trans(l), R_T, t_T)
        return (R_new, t_new), jnp.stack([l, ax, ay], axis=-1)

    (_, _), rel = jax.lax.scan(step, (R, t), (child_ids, parent_ids))
    # rel: (3, B, 5, 3) -> scatter back to node ids
    for d in range(3):
        out = out.at[:, child_ids[d], :].set(rel[d])
    return out


def bone_rel_trafo_inv(coords_rel: jnp.ndarray) -> jnp.ndarray:
    """(B, 21, 3) of [length, angle_x, angle_y] -> (B, 21, 3) xyz.

    Matches reference utils/relative_trafo.py:221-271.  The reconstructed
    point is ``T_new^{-1} @ 0 = -R_new^T t_new`` (rigid inverse).
    """
    rel = coords_rel
    if rel.ndim == 2:
        rel = rel[None]
    B = rel.shape[0]
    out = jnp.zeros((B, 21, 3), rel.dtype)

    root_ids = jnp.array(ROOT_CHILDREN)
    l0 = rel[:, root_ids, 0]
    ax0 = rel[:, root_ids, 1]
    ay0 = rel[:, root_ids, 2]
    R0 = rot_mat_x(-ax0) @ rot_mat_y(-ay0)                # (B, 6, 3, 3)
    t0 = _z_trans(l0)                                     # (B, 6, 3)
    x0 = -jnp.einsum("bnji,bnj->bni", R0, t0)             # -R^T t
    out = out.at[:, root_ids, :].set(x0)

    chains = jnp.array(FINGER_CHAINS)
    R = R0[:, 1:, :, :]
    t = t0[:, 1:, :]
    child_ids = chains[:, 1:].T                           # (3, 5)

    def step(carry, child):
        R_T, t_T = carry
        l = rel[:, child, 0]
        ax = rel[:, child, 1]
        ay = rel[:, child, 2]
        R_this = rot_mat_x(-ax) @ rot_mat_y(-ay)
        R_new, t_new = _compose(R_this, _z_trans(l), R_T, t_T)
        x = -jnp.einsum("bfji,bfj->bfi", R_new, t_new)
        return (R_new, t_new), x

    (_, _), xs = jax.lax.scan(step, (R, t), child_ids)
    for d in range(3):
        out = out.at[:, child_ids[d], :].set(xs[d])
    return out
