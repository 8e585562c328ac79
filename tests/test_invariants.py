"""Geometric invariants (properties beyond golden-value parity)."""

import jax.numpy as jnp
import numpy as np

from handpose_tpu import ops
from handpose_tpu.nn.fk import fk_positions
from handpose_tpu.nn.mano import ManoLayer, synthetic_mano


def _rand_coords(n=8, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, 21, 3)).astype(
            np.float32))


def test_canonical_frame_axioms():
    """After canonical_trafo: root at origin; the align node (12) lies on
    the y axis; the rot node (20) lies in the xz... y-plane (z == 0)."""
    coords = _rand_coords()
    can, rot = ops.canonical_trafo(coords)
    np.testing.assert_allclose(can[:, 0, :], 0.0, atol=1e-5)
    np.testing.assert_allclose(can[:, 12, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(can[:, 12, 2], 0.0, atol=1e-4)
    np.testing.assert_allclose(can[:, 20, 2], 0.0, atol=1e-4)
    # rot is orthonormal; the transform is rigid (norms preserved).
    # NB: the reference's accumulated total_rot_mat is NOT the exact
    # trans->can map (it composes the per-step rotations in reversed
    # order, a quirk we replicate for parity), so only rigidity is
    # checkable here.
    eye = jnp.broadcast_to(jnp.eye(3), rot.shape)
    np.testing.assert_allclose(rot @ jnp.swapaxes(rot, -1, -2), eye,
                               atol=1e-5)
    trans = coords - coords[:, :1, :]
    np.testing.assert_allclose(jnp.linalg.norm(can, axis=-1),
                               jnp.linalg.norm(trans, axis=-1), atol=1e-4)


def test_canonical_rotation_invariance():
    """Rigidly rotating the input must not change the canonical coords."""
    coords = _rand_coords(4, seed=1)
    R = ops.euler_xyz_rot_mat(jnp.asarray([[0.3, -0.7, 1.1]] * 4))
    rotated = jnp.einsum("bij,bnj->bni", R, coords)
    can_a, _ = ops.canonical_trafo(coords)
    can_b, _ = ops.canonical_trafo(rotated)
    np.testing.assert_allclose(can_a, can_b, atol=2e-4)


def test_fk_zero_pose_is_straight_chains():
    """All-zero angles: every finger extends along +z with cumulative
    bone lengths."""
    B = 2
    root = jnp.zeros((B, 3))
    other = jnp.zeros((B, 23))
    lengths = jnp.asarray(
        np.random.default_rng(2).uniform(0.2, 1.0, (B, 20)).astype(
            np.float32))
    pos = fk_positions(root, other, lengths)
    np.testing.assert_allclose(pos[:, 0], 0.0, atol=1e-7)
    L = np.asarray(lengths).reshape(B, 5, 4)
    expect_z = np.cumsum(L, axis=2).reshape(B, 20)
    np.testing.assert_allclose(np.asarray(pos[:, 1:, 2]), expect_z,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos[:, 1:, :2]), 0.0, atol=1e-6)


def test_fk_root_rotation_equivariance():
    """Rotating the root angles rotates all joints rigidly."""
    B = 2
    rng = np.random.default_rng(3)
    other = jnp.asarray(rng.normal(size=(B, 23)).astype(np.float32))
    lengths = jnp.asarray(rng.uniform(0.2, 1.0, (B, 20)).astype(np.float32))
    base = fk_positions(jnp.zeros((B, 3)), other, lengths)
    ang = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    rotated = fk_positions(ang, other, lengths)
    R = ops.euler_xyz_rot_mat(ang)
    np.testing.assert_allclose(np.asarray(rotated),
                               np.einsum("bij,bnj->bni", np.asarray(R),
                                         np.asarray(base)), atol=1e-5)


def test_mano_global_rotation_equivariance():
    layer = ManoLayer(model=synthetic_mano(), pose_num=10)
    rng = np.random.default_rng(4)
    poses = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))
    betas = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32) * 0.1)
    rots = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    v0, j0 = layer(jnp.zeros((2, 3)), poses, betas)
    vr, jr = layer(rots, poses, betas)
    R = ops.rodrigues(rots)
    np.testing.assert_allclose(np.asarray(jr),
                               np.einsum("bij,bnj->bni", np.asarray(R),
                                         np.asarray(j0)), atol=2e-5)
    np.testing.assert_allclose(np.asarray(vr),
                               np.einsum("bij,bnj->bni", np.asarray(R),
                                         np.asarray(v0)), atol=2e-5)


def test_projection_scale_invariance():
    """Pinhole projection is invariant to uniform depth+xy scaling."""
    rng = np.random.default_rng(5)
    xyz = jnp.asarray((rng.normal(size=(2, 21, 3)) * 0.1 +
                       np.array([0, 0, 0.7])).astype(np.float32))
    K = jnp.tile(jnp.asarray([[300., 0, 150], [0, 300., 150], [0, 0, 1]]),
                 (2, 1, 1))
    uv1 = ops.batch_project_xyz_to_uv(xyz, K)
    uv2 = ops.batch_project_xyz_to_uv(xyz * 3.0, K)
    np.testing.assert_allclose(uv1, uv2, rtol=1e-4)
