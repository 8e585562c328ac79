"""Pinhole camera projection and absolute/relative coordinate rescaling.

TPU-native port of reference utils/coordinate_trans.py:6-73 and
forwardKinematicsLayer.py:333-358.
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_xyz_to_uv(xyz: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points + (3, 3) intrinsics -> (N, 2) pixel coords.

    Reference utils/coordinate_trans.py:6-26 (no zero-depth guard there).
    """
    uvw = xyz @ K.T
    return uvw[..., :2] / uvw[..., 2:3]


def batch_project_xyz_to_uv(xyz: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) points + (B, 3, 3) intrinsics -> (B, N, 2).

    Reference utils/coordinate_trans.py:29-73 including the w==0 -> 1e-10
    guard.
    """
    p = jnp.einsum("bij,bnj->bni", K, xyz)
    w = p[..., 2]
    w = jnp.where(w == 0, 1e-10, w)
    return p[..., :2] / w[..., None]


def rel_normed_to_absolute(xyz_rel_normed: jnp.ndarray,
                           index_root_bone_length: jnp.ndarray,
                           xyz_root: jnp.ndarray) -> jnp.ndarray:
    """Undo root-relative scale-normalisation.

    Args:
      xyz_rel_normed: (B, N, 3) coords normalised by the root bone length.
      index_root_bone_length: (B, 1).
      xyz_root: (B, 3).
    Returns:
      (B, N, 3) absolute metric coords.

    Reference forwardKinematicsLayer.py:333-358.
    """
    scaled = xyz_rel_normed * index_root_bone_length[..., None]
    return scaled + xyz_root[:, None, :]


def absolute_to_rel_normed(xyz: jnp.ndarray):
    """Root-relative, scale-normalised coords (+ scale, root).

    Inverse of :func:`rel_normed_to_absolute`; the normaliser is the
    root->middle-MCP (index 12) distance as in reference
    dataloaderRHD.py:229-238.
    """
    root = xyz[:, 0, :]
    rel = xyz - root[:, None, :]
    scale = jnp.sqrt(jnp.sum(rel[:, 12, :] ** 2, axis=-1, keepdims=True))
    return rel / scale[..., None], scale, root
