"""Visibility-masked losses and loss aggregation.

TPU-native port of reference criterions/loss.py.  The reference uses
``torch.masked_select(...).mean()`` which produces dynamic shapes; the
static-shape equivalent with identical value is
``sum(d * vis) / sum(vis)`` plus the reference's "0 if nothing visible"
guard (loss.py:19-20) -- reproduced exactly so MPJPE parity holds.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, vis: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``values`` over True entries of ``vis``; 0 when none."""
    v = vis.reshape(values.shape).astype(values.dtype)
    n = jnp.sum(v)
    total = jnp.sum(values * v)
    return jnp.where(n > 0, total / jnp.maximum(n, 1.0), 0.0)


def masked_l2_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                   keypoint_vis: jnp.ndarray) -> jnp.ndarray:
    """Sum-of-squares over the coord axis, masked mean over (B, 21).

    Reference loss.py:6-23 (L2Loss).
    """
    sq = jnp.sum((pred - gt) ** 2, axis=2)
    return _masked_mean(sq, keypoint_vis)


def masked_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                   keypoint_vis: jnp.ndarray) -> jnp.ndarray:
    """Reference loss.py:26-46 (L1Loss)."""
    ab = jnp.sum(jnp.abs(pred - gt), axis=2)
    return _masked_mean(ab, keypoint_vis)


def contrastive_loss(feat1: jnp.ndarray, feat2: jnp.ndarray,
                     label: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """Reference loss.py:50-59 (torch pairwise_distance eps included)."""
    d = jnp.sqrt(jnp.sum((feat1 - feat2 + 1e-6) ** 2, axis=-1))
    return jnp.mean((1 - label) * d ** 2 +
                    label * jnp.maximum(margin - d, 0.0) ** 2)


def hand_mask_loss(pred_uv: jnp.ndarray, gt_uv: jnp.ndarray,
                   hand_mask: jnp.ndarray) -> jnp.ndarray:
    """Mask-coverage loss: 1 - sum(mask at pred uv)/sum(mask at gt uv).

    Reference loss.py:92-111; integer-truncated uv gather with clamping.
    """
    # clamp u by W and v by H (the reference clamps both by shape[-1],
    # loss.py:96-101 -- identical for its square 256^2 masks, wrong rows
    # for non-square ones, so the port clamps per-axis)
    H, W = hand_mask.shape[-2], hand_mask.shape[-1]
    lim = jnp.asarray([W - 1, H - 1], jnp.int32)
    gt = jnp.clip(gt_uv.astype(jnp.int32), 0, lim)
    pr = jnp.clip(pred_uv.astype(jnp.int32), 0, lim)
    b = jnp.arange(hand_mask.shape[0])[:, None]
    gt_samples = hand_mask[b, gt[..., 1], gt[..., 0]]
    pr_samples = hand_mask[b, pr[..., 1], pr[..., 0]]
    return 1.0 - jnp.sum(pr_samples) / (jnp.sum(gt_samples) + 1e-8)


def regularization_loss(theta: jnp.ndarray, beta: jnp.ndarray,
                        alpha_beta: float = 10.0) -> jnp.ndarray:
    """(|theta|_F + 10 |beta|_F) / 100  (reference loss.py:113-117)."""
    return (jnp.linalg.norm(theta) + alpha_beta * jnp.linalg.norm(beta)) / 100.0


def rot_mat_mse(pred_rot: jnp.ndarray, gt_rot: jnp.ndarray) -> jnp.ndarray:
    """Viewpoint rotation-matrix MSE for trainer-B models
    (reference trainval_hand3DPose.py:284-288)."""
    return jnp.mean((pred_rot - gt_rot) ** 2)


class LossTerms(NamedTuple):
    xyz: Optional[jnp.ndarray]
    uv: Optional[jnp.ndarray]
    contrastive: Optional[jnp.ndarray]
    hand_mask: Optional[jnp.ndarray]
    regularization: Optional[jnp.ndarray]


class LossCalculation:
    """Configurable multi-term criterion (reference loss.py:62-153)."""

    def __init__(self, loss_type: str = "L2", comp_xyz_loss=False,
                 comp_uv_loss=False, comp_contrastive_loss=False,
                 comp_hand_mask_loss=False, comp_regularization_loss=False):
        self.coord_loss = masked_l2_loss if loss_type == "L2" else masked_l1_loss
        self.comp_xyz_loss = comp_xyz_loss
        self.comp_uv_loss = comp_uv_loss
        self.comp_contrastive_loss = comp_contrastive_loss
        self.comp_hand_mask_loss = comp_hand_mask_loss
        self.comp_regularization_loss = comp_regularization_loss

    def __call__(self, pre_xyz, gt_xyz, pre_uv, gt_uv, keypoint_vis,
                 hand_mask=None, theta=None, beta=None, feat1=None,
                 feat2=None, label=None) -> LossTerms:
        loss_xyz = (self.coord_loss(pre_xyz, gt_xyz, keypoint_vis)
                    if self.comp_xyz_loss else None)
        loss_uv = (self.coord_loss(pre_uv, gt_uv, keypoint_vis)
                   if self.comp_uv_loss else None)
        loss_contrast = (contrastive_loss(feat1, feat2, label)
                         if self.comp_contrastive_loss else None)
        loss_hm = (hand_mask_loss(pre_uv, gt_uv, hand_mask)
                   if self.comp_hand_mask_loss else None)
        loss_reg = (regularization_loss(theta, beta)
                    if self.comp_regularization_loss else None)
        return LossTerms(loss_xyz, loss_uv, loss_contrast, loss_hm, loss_reg)
