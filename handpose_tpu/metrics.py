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


def pck(pred_xyz: jnp.ndarray, gt_xyz: jnp.ndarray,
        keypoint_vis: jnp.ndarray, thresholds: jnp.ndarray) -> jnp.ndarray:
    """Percentage of correct keypoints at each threshold (metres).

    Extension beyond the reference (which reports only MPJPE): the standard
    RHD evaluation protocol's PCK curve over visible joints.

    Args:
      thresholds: (T,) error thresholds in metres.
    Returns:
      (T,) fraction of visible joints with error < threshold.
    """
    dist = jnp.sqrt(jnp.sum((pred_xyz - gt_xyz) ** 2, axis=2))
    v = keypoint_vis.reshape(dist.shape).astype(dist.dtype)
    n = jnp.maximum(jnp.sum(v), 1.0)
    correct = (dist[None, ...] < thresholds[:, None, None]).astype(dist.dtype)
    return jnp.sum(correct * v[None], axis=(1, 2)) / n


def pck_sum_count(pred_xyz: jnp.ndarray, gt_xyz: jnp.ndarray,
                  keypoint_vis: jnp.ndarray, thresholds: jnp.ndarray):
    """((T,) correct-joint counts, visible-joint count) -- the exact
    whole-epoch aggregable form of :func:`pck` (sum the pair over batches,
    divide at the end), so the PCK pass can ride the SAME fused eval step
    as MPJPE instead of a second forward."""
    dist = jnp.sqrt(jnp.sum((pred_xyz - gt_xyz) ** 2, axis=2))
    v = keypoint_vis.reshape(dist.shape).astype(dist.dtype)
    correct = (dist[None, ...] < thresholds[:, None, None]).astype(dist.dtype)
    return jnp.sum(correct * v[None], axis=(1, 2)), jnp.sum(v)


def auc_pck(pred_xyz: jnp.ndarray, gt_xyz: jnp.ndarray,
            keypoint_vis: jnp.ndarray, lo: float = 0.02, hi: float = 0.05,
            steps: int = 31) -> jnp.ndarray:
    """Area under the PCK curve between ``lo`` and ``hi`` metres (the
    standard 20-50 mm RHD protocol), trapezoidal."""
    ts = jnp.linspace(lo, hi, steps)
    curve = pck(pred_xyz, gt_xyz, keypoint_vis, ts)
    return jnp.trapezoid(curve, ts) / (hi - lo)
