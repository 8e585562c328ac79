"""InterHand-style patch/affine preprocessing (C12 in SURVEY.md).

TPU-native port of reference utils/preprocessing.py:

* bbox helpers (``get_bbox``/``process_bbox``) -- numpy, host-side (they run
  once at annotation-parse time);
* affine patch warp (``gen_trans_from_patch_cv`` + warpAffine) -- the warp
  itself is a batched device-side bilinear affine sampler
  (:func:`affine_warp_bilinear`), fixed shapes, jit-able;
* heatmap-space transform (``transform_input_to_output_space``) -- jnp.
* augmentation parameter sampling (``get_aug_config``) -- numpy host RNG,
  mirroring the reference's train-time ranges.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


# -- host-side bbox arithmetic (reference preprocessing.py:122-155) --------

def get_bbox(joint_img: np.ndarray, joint_valid: np.ndarray) -> np.ndarray:
    x = joint_img[:, 0][joint_valid == 1]
    y = joint_img[:, 1][joint_valid == 1]
    xmin, xmax = x.min(), x.max()
    ymin, ymax = y.min(), y.max()
    xc, w = (xmin + xmax) / 2.0, xmax - xmin
    yc, h = (ymin + ymax) / 2.0, ymax - ymin
    return np.array([xc - 0.6 * w, yc - 0.6 * h, 1.2 * w, 1.2 * h],
                    np.float32)


def process_bbox(bbox: np.ndarray,
                 original_img_shape: Tuple[int, int],
                 input_img_shape: Tuple[int, int] = (256, 256)) -> np.ndarray:
    bbox = np.asarray(bbox, np.float32).copy()
    w, h = bbox[2], bbox[3]
    c_x = bbox[0] + w / 2.0
    c_y = bbox[1] + h / 2.0
    aspect = input_img_shape[1] / input_img_shape[0]
    if w > aspect * h:
        h = w / aspect
    elif w < aspect * h:
        w = h * aspect
    bbox[2] = w * 1.25
    bbox[3] = h * 1.25
    bbox[0] = c_x - bbox[2] / 2.0
    bbox[1] = c_y - bbox[3] / 2.0
    return bbox


def get_aug_config(rng: np.random.Generator):
    """Train-time augmentation parameters
    (reference preprocessing.py:33-48)."""
    trans_factor, scale_factor, rot_factor, color_factor = 0.15, 0.25, 45, 0.2
    trans = [rng.uniform(-trans_factor, trans_factor),
             rng.uniform(-trans_factor, trans_factor)]
    scale = float(np.clip(rng.standard_normal(), -1.0, 1.0)) * scale_factor + 1.0
    rot = float(np.clip(rng.standard_normal(), -2.0, 2.0)) * rot_factor \
        if rng.uniform() <= 0.6 else 0.0
    do_flip = rng.uniform() <= 0.5
    color_scale = rng.uniform(1 - color_factor, 1 + color_factor, 3)
    return trans, scale, rot, do_flip, color_scale


def _rotate_2d(pt, rot_rad):
    sn, cs = math.sin(rot_rad), math.cos(rot_rad)
    return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs],
                    np.float32)


def gen_trans_from_patch(c_x, c_y, src_w, src_h, dst_w, dst_h, scale, rot,
                         inv=False) -> np.ndarray:
    """2x3 affine src->patch transform (reference
    preprocessing.py:192-232), pure numpy (no cv2.getAffineTransform)."""
    sw, sh = src_w * scale, src_h * scale
    rot_rad = math.pi * rot / 180.0
    src_center = np.array([c_x, c_y], np.float32)
    src_down = _rotate_2d(np.array([0, sh * 0.5], np.float32), rot_rad)
    src_right = _rotate_2d(np.array([sw * 0.5, 0], np.float32), rot_rad)
    dst_center = np.array([dst_w * 0.5, dst_h * 0.5], np.float32)
    dst_down = np.array([0, dst_h * 0.5], np.float32)
    dst_right = np.array([dst_w * 0.5, 0], np.float32)
    src = np.stack([src_center, src_center + src_down,
                    src_center + src_right])
    dst = np.stack([dst_center, dst_center + dst_down,
                    dst_center + dst_right])
    if inv:
        src, dst = dst, src
    # solve affine A [3x3 homogeneous of src] = dst
    M = np.concatenate([src, np.ones((3, 1), np.float32)], axis=1)  # (3,3)
    A = np.linalg.solve(M, dst).T                                   # (2,3)
    return A.astype(np.float32)


def trans_point2d(pt, trans):
    p = np.array([pt[0], pt[1], 1.0], np.float32)
    return (trans @ p)[:2]


# -- device-side affine warp (replaces cv2.warpAffine) ---------------------

def affine_warp_bilinear(images: jnp.ndarray, trans: jnp.ndarray,
                         out_shape: Tuple[int, int]) -> jnp.ndarray:
    """Batched inverse-mapped bilinear warp.

    Args:
      images: (B, H, W, C).
      trans: (B, 2, 3) *src->dst* affines (as produced by
        :func:`gen_trans_from_patch`); sampling inverts them.
      out_shape: (out_h, out_w) static.
    Returns:
      (B, out_h, out_w, C); out-of-bounds samples are 0 like cv2's default
      border.
    """
    B, H, W, C = images.shape
    oh, ow = out_shape
    # invert each 2x3 affine
    A = trans[:, :, :2]
    t = trans[:, :, 2]
    Ainv = jnp.linalg.inv(A)
    tinv = -jnp.einsum("bij,bj->bi", Ainv, t)
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    dst = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)            # (P, 2)
    src = jnp.einsum("bij,pj->bpi", Ainv, dst) + tinv[:, None, :]
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = images.reshape(B, H * W, C)
        vals = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 + (v01 - v00) * wx[..., None]
    bot = v10 + (v11 - v10) * wx[..., None]
    out = top + (bot - top) * wy[..., None]
    return out.reshape(B, oh, ow, C)


# -- heatmap-space transform (reference preprocessing.py:87-120) -----------

def transform_input_to_output_space(joint_coord: jnp.ndarray,
                                    joint_valid: jnp.ndarray,
                                    rel_root_depth, root_valid,
                                    root_joint_idx: dict, joint_type: dict,
                                    input_img_shape=(256, 256),
                                    output_hm_shape=(64, 64, 64),
                                    bbox_3d_size=400.0,
                                    bbox_3d_size_root=400.0,
                                    output_root_hm_shape=64):
    """uvz (input px) -> heatmap-voxel coords; batched jnp."""
    jc = joint_coord
    x = jc[..., 0] / input_img_shape[1] * output_hm_shape[2]
    y = jc[..., 1] / input_img_shape[0] * output_hm_shape[1]
    z = jc[..., 2]
    r = jnp.asarray(root_joint_idx["right"])
    l = jnp.asarray(root_joint_idx["left"])
    zr = z - z[..., r][..., None]
    zl = z - z[..., l][..., None]
    is_right = jnp.zeros(jc.shape[-2], bool).at[
        jnp.asarray(joint_type["right"])].set(True)
    z = jnp.where(is_right, zr, zl)
    z = (z / (bbox_3d_size / 2) + 1) / 2.0 * output_hm_shape[0]
    valid = joint_valid * ((z >= 0) & (z < output_hm_shape[0]))
    rel_root_depth = (rel_root_depth / (bbox_3d_size_root / 2) + 1) / 2.0 \
        * output_root_hm_shape
    root_valid = root_valid * ((rel_root_depth >= 0) &
                               (rel_root_depth < output_root_hm_shape))
    return jnp.stack([x, y, z], axis=-1), valid, rel_root_depth, root_valid
