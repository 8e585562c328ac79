"""End-to-end parity: jitted device preprocess vs reference __getitem__.

The fixture `rhd_getitem` holds the reference dataset's full sample dicts
for 6 synthetic RHD samples; `rhd_raw` holds the same samples as raw
host inputs.  `preprocess_batch` must reproduce every tensor.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.data.preprocess import RawBatch, preprocess_batch


@pytest.fixture(scope="module")
def processed(fixtures):
    raw = fixtures("rhd_raw")
    batch = RawBatch(
        image=jnp.asarray(raw["image"]),
        mask=jnp.asarray(raw["mask"]),
        keypoint_uv=jnp.asarray(raw["keypoint_uv"]),
        keypoint_vis=jnp.asarray(raw["keypoint_vis"]),
        keypoint_xyz=jnp.asarray(raw["keypoint_xyz"]),
        camera_K=jnp.asarray(raw["camera_K"]),
    )
    return preprocess_batch(batch), fixtures("rhd_getitem")


def test_hand_side_and_xyz(processed):
    out, ref = processed
    np.testing.assert_array_equal(out["hand_side"], ref["hand_side"])
    np.testing.assert_allclose(out["keypoint_xyz21"], ref["keypoint_xyz21"],
                               atol=1e-6)
    np.testing.assert_allclose(out["keypoint_xyz_root"],
                               ref["keypoint_xyz_root"], atol=1e-6)
    np.testing.assert_allclose(out["keypoint_scale"], ref["keypoint_scale"],
                               rtol=1e-6)


def test_relative_and_canonical(processed):
    out, ref = processed
    np.testing.assert_allclose(out["keypoint_xyz21_rel_normed"],
                               ref["keypoint_xyz21_rel_normed"], atol=1e-5)
    np.testing.assert_allclose(out["keypoint_xyz21_local"],
                               ref["keypoint_xyz21_local"], atol=1e-4)
    np.testing.assert_allclose(out["kp_coord_xyz21_rel_can"],
                               ref["kp_coord_xyz21_rel_can"], atol=1e-4)
    np.testing.assert_allclose(out["rot_mat"], ref["rot_mat"], atol=1e-4)


def test_vis_uv(processed):
    out, ref = processed
    np.testing.assert_array_equal(
        np.asarray(out["keypoint_vis21"], np.float32), ref["keypoint_vis21"])
    np.testing.assert_allclose(out["keypoint_uv21"], ref["keypoint_uv21"],
                               rtol=1e-4, atol=2e-3)


def test_image_and_crop(processed):
    out, ref = processed
    # reference images are CHW; ours NHWC
    np.testing.assert_allclose(
        np.transpose(np.asarray(out["image"]), (0, 3, 1, 2)), ref["image"],
        atol=1e-6)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out["image_crop"]), (0, 3, 1, 2)),
        ref["image_crop"], atol=1e-5)
    np.testing.assert_array_equal(out["right_hand_mask"],
                                  ref["right_hand_mask"])


def test_intrinsics_and_scoremap(processed):
    out, ref = processed
    np.testing.assert_allclose(out["camera_intrinsic_matrix"],
                               ref["camera_intrinsic_matrix"], rtol=1e-5,
                               atol=1e-3)
    np.testing.assert_allclose(out["scoremap"], ref["scoremap"], atol=1e-5)


def test_palm_coord_mode(fixtures):
    """use_wrist_coord=False: palm-centre root replaces the wrist
    (reference dataloaderRHD.py:93-131, config.py:15)."""
    raw = fixtures("rhd_raw")
    batch = RawBatch(
        image=jnp.asarray(raw["image"]), mask=jnp.asarray(raw["mask"]),
        keypoint_uv=jnp.asarray(raw["keypoint_uv"]),
        keypoint_vis=jnp.asarray(raw["keypoint_vis"]),
        keypoint_xyz=jnp.asarray(raw["keypoint_xyz"]),
        camera_K=jnp.asarray(raw["camera_K"]))
    out = preprocess_batch(batch, use_wrist_coord=False)
    ref = fixtures("rhd_getitem_palm")
    np.testing.assert_allclose(out["keypoint_xyz21"], ref["keypoint_xyz21"],
                               atol=1e-6)
    np.testing.assert_allclose(out["keypoint_scale"], ref["keypoint_scale"],
                               rtol=1e-5)
    np.testing.assert_allclose(out["keypoint_xyz21_rel_normed"],
                               ref["keypoint_xyz21_rel_normed"], atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out["keypoint_vis21"], np.float32), ref["keypoint_vis21"])
    np.testing.assert_allclose(out["keypoint_uv21"], ref["keypoint_uv21"],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(out["scoremap"], ref["scoremap"], atol=1e-5)


def test_full_contract_masks(fixtures):
    """full_contract emits the reference's debug mask keys
    (dataloaderRHD.py:117-123, 171-187)."""
    raw = fixtures("rhd_raw")
    batch = RawBatch(
        image=jnp.asarray(raw["image"]), mask=jnp.asarray(raw["mask"]),
        keypoint_uv=jnp.asarray(raw["keypoint_uv"]),
        keypoint_vis=jnp.asarray(raw["keypoint_vis"]),
        keypoint_xyz=jnp.asarray(raw["keypoint_xyz"]),
        camera_K=jnp.asarray(raw["camera_K"]))
    out = preprocess_batch(batch, full_contract=True)
    m = raw["mask"].astype(np.int32)
    np.testing.assert_array_equal(out["hand_parts"], m)
    np.testing.assert_array_equal(out["hand_map_l"],
                                  ((m > 1) & (m < 18)).astype(np.int32))
    np.testing.assert_array_equal(out["hand_map_r"], (m > 17).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(out["hand_mask"])[..., 1],
                                  (m > 1).astype(np.int32))


def test_gt_reprojection_sanity(fixtures):
    """The reference's per-batch GT round trip (inference.py:176-179):
    project(rel_normed*scale + root, K') must reproduce uv21."""
    raw = fixtures("rhd_raw")
    batch = RawBatch(
        image=jnp.asarray(raw["image"]), mask=jnp.asarray(raw["mask"]),
        keypoint_uv=jnp.asarray(raw["keypoint_uv"]),
        keypoint_vis=jnp.asarray(raw["keypoint_vis"]),
        keypoint_xyz=jnp.asarray(raw["keypoint_xyz"]),
        camera_K=jnp.asarray(raw["camera_K"]))
    out = preprocess_batch(batch)
    from handpose_tpu.ops.projection import batch_project_xyz_to_uv
    uv = batch_project_xyz_to_uv(out["keypoint_xyz21"],
                                 out["camera_intrinsic_matrix"])
    # synthetic annotations are exactly consistent, so the round trip is
    # exact up to fp error
    np.testing.assert_allclose(np.asarray(uv),
                               np.asarray(out["keypoint_uv21"]),
                               rtol=1e-3, atol=0.1)
