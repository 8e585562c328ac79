"""Gaussian scoremap rendering.

TPU-native port of the per-sample CPU scoremap renderers that are duplicated
in both reference dataloaders (dataloaderRHD.py:538-584,
dataloaderInterHand2M6.py:609-656) and of the 3-D variant
(utils/compute_heatmap.py:12-26).

Design: the reference materialises a full (H, W, 21) squared-distance tensor.
A 2-D isotropic Gaussian is separable --
``exp(-(dx^2+dy^2)/s^2) = exp(-dx^2/s^2) * exp(-dy^2/s^2)`` -- so we render
two thin (K, H) / (K, W) factors and take their outer product, an
arithmetic-intensity win of ~H/2 per keypoint that XLA maps onto the VPU as
one fused broadcast-multiply.  Bit-equal to the reference formula because
exp(a+b) factorisation is exact in the formula and float rounding stays
within 1 ulp of the fused form.
"""

from __future__ import annotations

import jax.numpy as jnp


def render_gaussian_maps(coords_hw: jnp.ndarray,
                         output_size: tuple[int, int],
                         sigma: float,
                         valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Render K Gaussian scoremaps per batch element.

    Args:
      coords_hw: (B, K, 2) keypoint (row, col) coordinates.  Like the
        reference they are truncated to int32 grid positions first
        (dataloaderRHD.py:545).
      output_size: (H, W) static.
      sigma: Gaussian width (the reference divides by sigma^2).
      valid: optional (B, K) / (B, K, 1) visibility; invalid keypoints render
        as zeros.

    Returns:
      (B, K, H, W) float32 scoremaps.
    """
    H, W = output_size
    coords = coords_hw.astype(jnp.int32).astype(jnp.float32)
    cy = coords[..., 0]                                    # (B, K)
    cx = coords[..., 1]

    if valid is not None:
        v = valid.reshape(valid.shape[0], valid.shape[1]).astype(jnp.float32)
        cond_val = v > 0.5
    else:
        cond_val = jnp.ones_like(cy, dtype=bool)
    cond_in = ((cy < H - 1) & (cy > 0)) & ((cx < W - 1) & (cx > 0))
    cond = (cond_val & cond_in).astype(jnp.float32)

    inv_s2 = 1.0 / (jnp.float32(sigma) ** 2)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    gy = jnp.exp(-((ys[None, None, :] - cy[..., None]) ** 2) * inv_s2)  # (B,K,H)
    gx = jnp.exp(-((xs[None, None, :] - cx[..., None]) ** 2) * inv_s2)  # (B,K,W)
    maps = gy[..., :, None] * gx[..., None, :]                           # (B,K,H,W)
    return maps * cond[..., None, None]


def render_gaussian_heatmap_3d(joint_coords: jnp.ndarray,
                               output_hm_shape: tuple[int, int, int],
                               sigma: float = 2.5) -> jnp.ndarray:
    """3-D Gaussian volumes for InterHand-style supervision.

    Args:
      joint_coords: (B, J, 3) as (x, y, z) in heatmap voxels.
      output_hm_shape: (D, H, W) static.
    Returns:
      (B, J, D, H, W) with the reference's x255 scaling
      (utils/compute_heatmap.py:12-26).  Separable rendering as above.
    """
    D, H, W = output_hm_shape
    x = joint_coords[..., 0]
    y = joint_coords[..., 1]
    z = joint_coords[..., 2]
    inv = 1.0 / (2.0 * sigma ** 2)
    zz = jnp.arange(D, dtype=jnp.float32)
    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    gz = jnp.exp(-((zz[None, None, :] - z[..., None]) ** 2) * inv)
    gy = jnp.exp(-((yy[None, None, :] - y[..., None]) ** 2) * inv)
    gx = jnp.exp(-((xx[None, None, :] - x[..., None]) ** 2) * inv)
    vol = (gz[..., :, None, None] * gy[..., None, :, None] * gx[..., None, None, :])
    return vol * 255.0
