"""Evaluation metrics.

TPU-native port of reference criterions/metrics.py (visibility-masked MPJPE
in millimetres) with the same static-shape masked mean used by the losses.
"""

from __future__ import annotations

import jax.numpy as jnp


def mpjpe(pred_xyz: jnp.ndarray, gt_xyz: jnp.ndarray,
          keypoint_vis: jnp.ndarray) -> jnp.ndarray:
    """Visibility-masked mean per-joint position error x1000 (m -> mm).

    Reference criterions/metrics.py:6-27 including the all-invisible -> 0
    guard.
    """
    dist = jnp.sqrt(jnp.sum((pred_xyz - gt_xyz) ** 2, axis=2))
    v = keypoint_vis.reshape(dist.shape).astype(dist.dtype)
    n = jnp.sum(v)
    mean = jnp.where(n > 0, jnp.sum(dist * v) / jnp.maximum(n, 1.0), 0.0)
    return mean * 1000.0


def masked_sum_count(pred_xyz: jnp.ndarray, gt_xyz: jnp.ndarray,
                     keypoint_vis: jnp.ndarray):
    """(sum of masked distances x1000, count) -- for exact whole-epoch
    aggregation across batches/devices (fixes the reference's last-batch-only
    eval bug, inference.py:241-242, and its mean-of-batch-means bias)."""
    dist = jnp.sqrt(jnp.sum((pred_xyz - gt_xyz) ** 2, axis=2))
    v = keypoint_vis.reshape(dist.shape).astype(dist.dtype)
    return jnp.sum(dist * v) * 1000.0, jnp.sum(v)
