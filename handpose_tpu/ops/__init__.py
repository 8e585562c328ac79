"""Geometry & rendering kernel library (pure jnp, batch-first, static shapes).

TPU-native equivalent of reference utils/ (L1 in SURVEY.md): every hot
per-sample CPU transform from the reference dataloaders/models re-expressed
as fused, jit-able batched ops.
"""

from .rotations import (atan2_safe, rot_mat_x, rot_mat_y, rot_mat_z,
                        euler_xyz_rot_mat, axis_angle_rot_mat, rodrigues)
from .canonical import canonical_trafo, flip_right_hand
from .bone_rel import bone_rel_trafo, bone_rel_trafo_inv
from .projection import (camera_xyz_to_uv, batch_project_xyz_to_uv,
                         rel_normed_to_absolute, absolute_to_rel_normed)
from .heatmap import render_gaussian_maps, render_gaussian_heatmap_3d
from .crop import (CropParams, compute_crop_params, crop_resize_bilinear,
                   crop_resize_nearest, crop_intrinsics, crop_uv)
from .camera import world2cam, cam2pixel, pixel2cam
from .patch import (get_bbox, process_bbox, gen_trans_from_patch,
                    affine_warp_bilinear, transform_input_to_output_space,
                    get_aug_config, trans_point2d)

__all__ = [
    "atan2_safe", "rot_mat_x", "rot_mat_y", "rot_mat_z",
    "euler_xyz_rot_mat", "axis_angle_rot_mat", "rodrigues",
    "canonical_trafo", "flip_right_hand",
    "bone_rel_trafo", "bone_rel_trafo_inv",
    "camera_xyz_to_uv", "batch_project_xyz_to_uv",
    "rel_normed_to_absolute", "absolute_to_rel_normed",
    "render_gaussian_maps", "render_gaussian_heatmap_3d",
    "CropParams", "compute_crop_params", "crop_resize_bilinear",
    "crop_resize_nearest", "crop_intrinsics", "crop_uv",
    "world2cam", "cam2pixel", "pixel2cam",
    "get_bbox", "process_bbox", "gen_trans_from_patch",
    "affine_warp_bilinear", "transform_input_to_output_space",
    "get_aug_config", "trans_point2d",
]
