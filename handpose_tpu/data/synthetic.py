"""Synthetic (fake-data) batches: the reference's debug backend.

TPU-native port of ``trainval_fake`` (reference trainval.py:405-587,
trainval_hand3DPose.py:337-478): a half-bright/half-dark image, a fixed
21x3 GT pose with a per-run random bias, a synthetic pinhole camera
(f=600, c=300), full visibility, and (for trainer-B) a synthetic GT
rotation.  Exercises the whole model/loss/optimizer loop with no dataset
on disk.
"""

from __future__ import annotations

import numpy as np

from ..ops.rotations import axis_angle_rot_mat
import jax.numpy as jnp


def fake_sample_batch(batch_size: int, image_size: int = 256,
                      input_channels: int = 3, seed: int = 0,
                      bias: float | None = None) -> dict:
    """Build the sample-dict contract from synthetic data."""
    rng = np.random.default_rng(seed)
    if bias is None:
        bias = float(rng.uniform(-0.001, 0.001))

    B, S = batch_size, image_size
    image = np.full((B, S, S, 3), 0.5, np.float32)
    image[:, S // 2:, :, :] = -0.5

    xyz = np.full((B, 21, 3), 0.5, np.float32)
    xyz[:, 0] = 0.0
    xyz[:, -10:] = -0.5
    xyz += bias

    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 600.0
    K[:, 0, 2] = K[:, 1, 2] = 300.0
    K[:, 2, 2] = 1.0

    vis = np.ones((B, 21, 1), np.float32)
    scale = np.ones((B, 1), np.float32)
    root = np.zeros((B, 3), np.float32)
    uvw = np.einsum("bij,bnj->bni", K, xyz + np.array([0, 0, 1.0],
                                                     np.float32))
    uv = uvw[..., :2] / uvw[..., 2:3]
    scoremap = np.zeros((B, 21, S, S), np.float32)

    u = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    gt_rot = np.asarray(axis_angle_rot_mat(jnp.asarray(u)))

    return {
        "image_crop": jnp.asarray(image),
        "keypoint_vis21": jnp.asarray(vis),
        "keypoint_scale": jnp.asarray(scale),
        "keypoint_xyz_root": jnp.asarray(root),
        "keypoint_uv21": jnp.asarray(uv),
        "keypoint_xyz21": jnp.asarray(xyz),
        "keypoint_xyz21_rel_normed": jnp.asarray(xyz),
        "kp_coord_xyz21_rel_can": jnp.asarray(xyz),
        "rot_mat": jnp.asarray(gt_rot),
        "scoremap": jnp.asarray(scoremap),
        "camera_intrinsic_matrix": jnp.asarray(K),
        "right_hand_mask": jnp.zeros((B, S, S), jnp.float32),
    }
