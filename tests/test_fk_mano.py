"""Golden parity tests for the FK and MANO layers vs the torch reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.nn.fk import forward_kinematics
from handpose_tpu.nn.mano import ManoLayer, find_mano_pkl, load_mano


@pytest.mark.parametrize("switched", [True, False])
def test_forward_kinematics(fixtures, switched):
    f = fixtures("fk")
    fn = jax.jit(lambda *a: forward_kinematics(
        *a, joint_order_switched=switched))
    xyz, uv = fn(jnp.asarray(f["root_angles"]), jnp.asarray(f["other_angles"]),
                 jnp.asarray(f["bone_lengths"]), jnp.asarray(f["K"]),
                 jnp.asarray(f["scale"]), jnp.asarray(f["root"]))
    key = "noswitch" if switched else "switch"
    np.testing.assert_allclose(xyz, f[f"xyz_{key}"], atol=2e-5)
    np.testing.assert_allclose(uv, f[f"uv_{key}"], rtol=1e-4, atol=5e-2)


@pytest.mark.parametrize("pose_num", [6, 10, 45])
def test_mano_layer(fixtures, pose_num):
    if find_mano_pkl() is None:
        pytest.skip("MANO asset not available")
    f = fixtures(f"mano_p{pose_num}")
    layer = ManoLayer(pose_num=pose_num)
    verts, joints = jax.jit(layer.rot_pose_beta_to_mesh)(
        jnp.asarray(f["rots"]), jnp.asarray(f["poses"]),
        jnp.asarray(f["betas"]))
    np.testing.assert_allclose(verts, f["verts"], atol=2e-5)
    np.testing.assert_allclose(joints, f["joints"], atol=2e-5)


def test_mano_synthetic_shapes():
    from handpose_tpu.nn.mano import synthetic_mano
    layer = ManoLayer(model=synthetic_mano(), pose_num=10)
    rng = np.random.default_rng(0)
    verts, joints = layer(jnp.asarray(rng.normal(size=(2, 3)), jnp.float32),
                          jnp.asarray(rng.normal(size=(2, 10)), jnp.float32),
                          jnp.asarray(rng.normal(size=(2, 10)), jnp.float32))
    assert verts.shape == (2, 778, 3)
    assert joints.shape == (2, 21, 3)


def test_fk_differentiable(fixtures):
    f = fixtures("fk")

    def loss(other):
        xyz, _ = forward_kinematics(
            jnp.asarray(f["root_angles"]), other,
            jnp.asarray(f["bone_lengths"]), jnp.asarray(f["K"]),
            jnp.asarray(f["scale"]), jnp.asarray(f["root"]))
        return jnp.sum(xyz ** 2)

    g = jax.grad(loss)(jnp.asarray(f["other_angles"]))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_mesh_export_and_render(tmp_path):
    from handpose_tpu.nn.mano import synthetic_mano
    from handpose_tpu.utils.vis import plot_mesh, save_mesh_obj

    layer = ManoLayer(model=synthetic_mano(), pose_num=10)
    rng = np.random.default_rng(1)
    verts, joints = layer(
        jnp.asarray(rng.normal(size=(1, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 10)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 10)), jnp.float32))
    obj = tmp_path / "hand.obj"
    save_mesh_obj(np.asarray(verts[0]), layer.faces, str(obj))
    txt = obj.read_text().splitlines()
    assert sum(1 for l in txt if l.startswith("v ")) == 778
    assert sum(1 for l in txt if l.startswith("f ")) == len(layer.faces)
    png = tmp_path / "hand.png"
    # synthetic faces are degenerate (all zeros); use a tiny valid mesh
    tri_v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    tri_f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3]])
    plot_mesh(tri_v, tri_f, str(png), joints=np.asarray(joints[0]))
    assert png.exists() and png.stat().st_size > 0
