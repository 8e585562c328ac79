"""Differentiable forward kinematics over the 20-node hand graph.

TPU-native redesign of reference
network/sub_modules/forwardKinematicsLayer.py:142-358.  The reference builds
the pose with a python loop over 20 nodes, growing tensors with
``torch.cat`` per step.  Here:

* the per-node angle wiring (thumb gets 3+3+1 DOF, other fingers 2+1+1;
  reference bonePrediction.py:5-46) is a static (20, 3, 23) selection tensor
  -- one einsum gathers every joint's euler triple at once;
* the five finger chains are structurally identical, so local rotations are
  computed for all 20 joints in one batched euler call and chained with a
  ``lax.scan`` over depth 4 with the fingers stacked on an axis
  (B x 5 batched 3x3 matmuls per step instead of 20 sequential graph nodes).

Node order: A1..A4, B1..B4, C1..C4, D1..D4, E1..E4 (A=thumb..E=pinky);
``bone_lengths[:, i]`` is the parent->node_i bone, same order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.projection import batch_project_xyz_to_uv, rel_normed_to_absolute
from ..ops.rotations import euler_xyz_rot_mat


def _angle_selection_table() -> np.ndarray:
    """(20, 3, 23) one-hot map: other_angles -> per-node (x, y, z) euler."""
    S = np.zeros((20, 3, 23), np.float32)
    # thumb (reference forwardKinematicsLayer.py:239-255)
    S[0, 0, 0] = S[0, 1, 1] = S[0, 2, 2] = 1.0   # A1: x,y,z <- 0,1,2
    S[1, 0, 3] = S[1, 1, 4] = S[1, 2, 5] = 1.0   # A2: x,y,z <- 3,4,5
    S[2, 1, 6] = 1.0                             # A3: y <- 6
    # other fingers (reference forwardKinematicsLayer.py:257-274)
    slot = 7
    for f in range(1, 5):
        base = 4 * f
        S[base + 0, 0, slot] = 1.0       # *1: x
        S[base + 0, 1, slot + 1] = 1.0   # *1: y
        S[base + 1, 0, slot + 2] = 1.0   # *2: x
        S[base + 2, 0, slot + 3] = 1.0   # *3: x
        slot += 4
    return S


_SEL = _angle_selection_table()

# MANO<->RHD joint-order swap (reference forwardKinematicsLayer.py:324-327):
# within each finger block [i..i+3], reverse the order.
JOINT_SWITCH_PERM = [0] + [i + d for i in (1, 5, 9, 13, 17)
                           for d in (3, 2, 1, 0)]


def fk_positions(root_angles: jnp.ndarray, other_angles: jnp.ndarray,
                 bone_lengths: jnp.ndarray) -> jnp.ndarray:
    """Run FK; returns root-relative joint positions (B, 21, 3).

    Args:
      root_angles: (B, 3) global wrist euler angles.
      other_angles: (B, 23) articulation DOFs.
      bone_lengths: (B, 20).
    """
    B = root_angles.shape[0]
    sel = jnp.asarray(_SEL)
    joint_angles = jnp.einsum("nak,bk->bna", sel, other_angles)   # (B, 20, 3)
    local_rots = euler_xyz_rot_mat(joint_angles)                  # (B, 20, 3, 3)
    local_rots = local_rots.reshape(B, 5, 4, 3, 3)
    lengths = bone_lengths.reshape(B, 5, 4)

    root_rot = euler_xyz_rot_mat(root_angles)                     # (B, 3, 3)
    R0 = jnp.broadcast_to(root_rot[:, None], (B, 5, 3, 3))
    p0 = jnp.zeros((B, 5, 3), root_angles.dtype)

    def step(carry, inp):
        R_par, p_par = carry
        local, length = inp                                       # (B,5,3,3), (B,5)
        R = R_par @ local
        offset = R[..., :, 2] * length[..., None]                 # R @ [0,0,l]
        p = p_par + offset
        return (R, p), p

    xs = (jnp.moveaxis(local_rots, 2, 0), jnp.moveaxis(lengths, 2, 0))
    (_, _), ps = jax.lax.scan(step, (R0, p0), xs)                 # (4, B, 5, 3)
    ps = jnp.moveaxis(ps, 0, 2).reshape(B, 20, 3)                 # node order
    root = jnp.zeros((B, 1, 3), root_angles.dtype)
    return jnp.concatenate([root, ps], axis=1)


def forward_kinematics(root_angles: jnp.ndarray, other_angles: jnp.ndarray,
                       bone_lengths: jnp.ndarray,
                       camera_intrinsic_matrix: jnp.ndarray,
                       index_root_bone_length: jnp.ndarray,
                       kp_coord_xyz_root: jnp.ndarray,
                       joint_order_switched: bool = True):
    """Full FK layer: articulation -> absolute xyz + projected uv.

    Matches reference forwardKinematicsLayer.py:147-330.  When
    ``joint_order_switched`` is False the reference permutes the output back
    to RHD order; here that is a static gather (no in-place swaps).

    Returns:
      (kp_coord_xyz21_absolute (B, 21, 3), kp_coord_uv21 (B, 21, 2)).
    """
    positions = fk_positions(root_angles, other_angles, bone_lengths)
    xyz_abs = rel_normed_to_absolute(positions, index_root_bone_length,
                                     kp_coord_xyz_root)
    if not joint_order_switched:
        xyz_abs = xyz_abs[:, jnp.asarray(JOINT_SWITCH_PERM), :]
    uv = batch_project_xyz_to_uv(xyz_abs, camera_intrinsic_matrix)
    return xyz_abs, uv
