"""World/camera/pixel conversions (InterHand2.6M style).

TPU-native port of reference utils/transforms.py:11-27 (numpy originals).
Batched, pure jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def world2cam(world_coord: jnp.ndarray, R: jnp.ndarray,
              t: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) world -> camera coords; R (..., 3, 3), t (..., 3)."""
    return jnp.einsum("...ij,...nj->...ni", R, world_coord) + t[..., None, :]


def cam2pixel(cam_coord: jnp.ndarray, f: jnp.ndarray,
              c: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) cam -> (..., N, 3) of (u, v, z); f/c are (..., 2)."""
    z = cam_coord[..., 2]
    # +1e-8 depth guard matches reference transforms.py:11-16
    x = cam_coord[..., 0] / (z + 1e-8) * f[..., None, 0] + c[..., None, 0]
    y = cam_coord[..., 1] / (z + 1e-8) * f[..., None, 1] + c[..., None, 1]
    return jnp.stack([x, y, z], axis=-1)


def pixel2cam(pixel_coord: jnp.ndarray, f: jnp.ndarray,
              c: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) of (u, v, z) -> camera xyz."""
    z = pixel_coord[..., 2]
    x = (pixel_coord[..., 0] - c[..., None, 0]) / f[..., None, 0] * z
    y = (pixel_coord[..., 1] - c[..., None, 1]) / f[..., None, 1] * z
    return jnp.stack([x, y, z], axis=-1)
