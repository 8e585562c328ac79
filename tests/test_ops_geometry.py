"""Golden parity tests for the geometry op library vs the torch reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu import ops


def test_canonical_trafo(fixtures):
    f = fixtures("canonical")
    normed, rot = jax.jit(ops.canonical_trafo)(jnp.asarray(f["coords"]))
    np.testing.assert_allclose(normed, f["normed"], atol=2e-5)
    np.testing.assert_allclose(rot, f["rot"], atol=2e-5)


def test_flip_right_hand(fixtures):
    f = fixtures("canonical")
    flipped = ops.flip_right_hand(jnp.asarray(f["normed"]),
                                  jnp.asarray(f["cond"]))
    np.testing.assert_allclose(flipped, f["flipped"], atol=1e-6)


def test_bone_rel_trafo(fixtures):
    f = fixtures("bone_rel")
    rel = jax.jit(ops.bone_rel_trafo)(jnp.asarray(f["coords"]))
    np.testing.assert_allclose(rel, f["rel"], atol=3e-5)


def test_bone_rel_trafo_inv(fixtures):
    f = fixtures("bone_rel")
    back = jax.jit(ops.bone_rel_trafo_inv)(jnp.asarray(f["rel"]))
    np.testing.assert_allclose(back, f["back"], atol=3e-5)


def test_bone_rel_roundtrip(fixtures):
    f = fixtures("bone_rel")
    rel = ops.bone_rel_trafo(jnp.asarray(f["coords"]))
    back = ops.bone_rel_trafo_inv(rel)
    # the reference round-trip reproduces the input coords; so must ours
    np.testing.assert_allclose(back, f["coords"], atol=2e-4)


def test_batch_projection(fixtures):
    f = fixtures("projection")
    uv = jax.jit(ops.batch_project_xyz_to_uv)(jnp.asarray(f["xyz"]),
                                              jnp.asarray(f["K"]))
    np.testing.assert_allclose(uv, f["uv"], rtol=1e-5, atol=1e-3)


def test_single_projection(fixtures):
    f = fixtures("projection")
    uv = ops.camera_xyz_to_uv(jnp.asarray(f["xyz"][0]), jnp.asarray(f["K"][0]))
    np.testing.assert_allclose(uv, f["uv_single"], rtol=1e-5, atol=1e-3)


def test_axis_angle_rot_mat(fixtures):
    f = fixtures("rotations")
    R = jax.jit(ops.axis_angle_rot_mat)(jnp.asarray(f["u"]))
    np.testing.assert_allclose(R, f["R_aa"], atol=2e-6)


def test_euler_rot_mat(fixtures):
    f = fixtures("rotations")
    R = jax.jit(ops.euler_xyz_rot_mat)(jnp.asarray(f["angles"]))
    np.testing.assert_allclose(R, f["R_euler"], atol=2e-6)


def test_rodrigues_orthonormal():
    r = jnp.asarray(np.random.default_rng(0).normal(size=(32, 3)) * 2)
    R = ops.rodrigues(r)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    # small-angle branch
    R0 = ops.rodrigues(jnp.zeros((2, 3)))
    np.testing.assert_allclose(R0, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
                               atol=1e-7)


def test_scoremap(fixtures):
    f = fixtures("scoremap")
    maps = jax.jit(lambda c, v: ops.render_gaussian_maps(
        c, (256, 256), 25.0, v))(jnp.asarray(f["coords_hw"]),
                                 jnp.asarray(f["vis"]))
    np.testing.assert_allclose(maps, f["maps"], atol=1e-5)


def test_crop_params_and_resize(fixtures):
    f = fixtures("crop")
    uv = jnp.asarray(f["kp_uv"])
    vis = jnp.asarray(f["kp_vis"])
    params = ops.compute_crop_params(uv, vis, (320, 320), 256)
    np.testing.assert_array_equal(np.stack([params.y1, params.x1], 1),
                                  f["y1x1"])
    np.testing.assert_array_equal(np.stack([params.len_y, params.len_x], 1),
                                  f["lens"])
    crops = jax.jit(lambda im, p: ops.crop_resize_bilinear(im, p, 256))(
        jnp.asarray(f["img"]), params)
    np.testing.assert_allclose(crops, f["crops"], atol=1e-5)
    uvs = ops.crop_uv(uv, params)
    np.testing.assert_allclose(uvs, f["uvs"], rtol=1e-5, atol=1e-3)
    K_new = ops.crop_intrinsics(jnp.asarray(f["K"]), params)
    np.testing.assert_allclose(K_new, f["K_new"], rtol=1e-5, atol=1e-3)


def test_rel_normed_roundtrip():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.normal(size=(4, 21, 3)).astype(np.float32))
    rel, scale, root = ops.absolute_to_rel_normed(xyz)
    back = ops.rel_normed_to_absolute(rel, scale, root)
    np.testing.assert_allclose(back, xyz, atol=1e-5)


def test_camera_conversions_roundtrip():
    rng = np.random.default_rng(2)
    cam = jnp.asarray(rng.uniform(0.3, 1.0, size=(2, 21, 3)).astype(np.float32))
    focal = jnp.asarray([[600.0, 600.0], [500.0, 550.0]])
    princ = jnp.asarray([[300.0, 300.0], [320.0, 310.0]])
    pix = ops.cam2pixel(cam, focal, princ)
    back = ops.pixel2cam(pix, focal, princ)
    np.testing.assert_allclose(back, cam, rtol=1e-5, atol=1e-5)


def test_scoremap_pallas_interpret(fixtures):
    """Pallas kernel (interpret mode on CPU) matches the jnp renderer."""
    from handpose_tpu.ops.pallas_kernels import render_gaussian_maps_pallas

    f = fixtures("scoremap")
    maps = render_gaussian_maps_pallas(
        jnp.asarray(f["coords_hw"]), (256, 256), 25.0,
        jnp.asarray(f["vis"]), interpret=True)
    np.testing.assert_allclose(maps, f["maps"], atol=1e-5)


def test_affine_warp_matches_cv2():
    """affine_warp_bilinear == cv2.warpAffine(INTER_LINEAR, border 0) for
    the patch transforms of ops.patch (reference preprocessing.py:157-190)."""
    import cv2

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (2, 48, 64, 3)).astype(np.float32)
    outs_ref, trans_list = [], []
    for i in range(2):
        t = ops.gen_trans_from_patch(c_x=30.0 + i * 3, c_y=22.0, src_w=40,
                                     src_h=30, dst_w=32, dst_h=24,
                                     scale=1.1, rot=15.0 * (i + 1))
        trans_list.append(t)
        outs_ref.append(cv2.warpAffine(img[i], t, (32, 24),
                                       flags=cv2.INTER_LINEAR))
    out = ops.affine_warp_bilinear(jnp.asarray(img),
                                   jnp.asarray(np.stack(trans_list)),
                                   (24, 32))
    np.testing.assert_allclose(np.asarray(out), np.stack(outs_ref),
                               atol=2e-3)


def test_transform_input_to_output_space():
    """Heatmap-space transform matches the reference formula
    (preprocessing.py:87-120)."""
    rng = np.random.default_rng(4)
    jc = jnp.asarray(rng.uniform(0, 256, (2, 42, 3)).astype(np.float32))
    valid = jnp.ones((2, 42))
    out, v, rd, rv = ops.transform_input_to_output_space(
        jc, valid, rel_root_depth=jnp.zeros((2,)), root_valid=jnp.ones((2,)),
        root_joint_idx={"right": 20, "left": 41},
        joint_type={"right": np.arange(21), "left": np.arange(21, 42)})
    np.testing.assert_allclose(out[..., 0], jc[..., 0] / 256 * 64, rtol=1e-6)
    # per-hand root depth is centred: z at the root indices == 32
    np.testing.assert_allclose(out[:, 20, 2], 32.0, atol=1e-4)
    np.testing.assert_allclose(out[:, 41, 2], 32.0, atol=1e-4)
    np.testing.assert_allclose(rd, 32.0, atol=1e-5)


def test_rodrigues_grad_finite_at_zero():
    """sqrt(0) has an infinite derivative; unguarded it leaked NaN into
    the gradient at exactly-zero rotation vectors (the natural init for
    MANO thetas).  Values AND grads must be finite and correct there."""
    from handpose_tpu.ops.rotations import rodrigues

    g = jax.grad(lambda r: jnp.sum(rodrigues(r)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    # the sum of a skew generator's entries is 0 => zero grad is exact
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    # value at zero is the identity
    np.testing.assert_allclose(np.asarray(rodrigues(jnp.zeros(3))),
                               np.eye(3), atol=1e-7)
    # batch mixing zero and non-zero: every grad entry finite
    r = jnp.asarray([[0., 0., 0.], [0.3, -0.2, 0.9]])
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(rodrigues(x))))(r)
    assert np.all(np.isfinite(np.asarray(g2)))


def test_crop_params_degenerate_center_clamped():
    """A noisy crop center past the image border must yield a >=1-pixel
    window with finite scales, not len 0 / scale inf."""
    uv = jnp.tile(jnp.asarray([[310.0, 315.0]]), (1, 21, 1))
    vis = jnp.ones((1, 21), bool)
    # offset noise pushes the center far outside the image
    params = ops.compute_crop_params(
        uv, vis, (320, 320), 256,
        offset_noise=jnp.asarray([[500.0, 500.0]]))
    assert int(params.len_y[0]) >= 1 and int(params.len_x[0]) >= 1
    assert np.isfinite(float(params.scale_y[0]))
    assert np.isfinite(float(params.scale_x[0]))
    assert int(params.y1[0]) <= 319 and int(params.x1[0]) <= 319


def test_flip_right_hand_per_keypoint_unbatched():
    """Unbatched (N,3) coords with a per-keypoint (N,) cond must flip
    each keypoint by ITS OWN flag (reference unsqueezes cond at axis 0
    then appends one axis; a trailing-axes reshape broadcast every
    keypoint by flag 0)."""
    coords = jnp.asarray(np.random.default_rng(0).normal(
        size=(21, 3)).astype(np.float32))
    cond = jnp.asarray((np.arange(21) % 2).astype(bool))
    out = np.asarray(ops.flip_right_hand(coords, cond))
    assert out.shape == (21, 3)
    ref = np.asarray(coords).copy()
    ref[1::2, 2] *= -1.0
    np.testing.assert_allclose(out, ref, atol=0)
