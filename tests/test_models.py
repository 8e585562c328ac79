"""Construct + forward every zoo model on tiny inputs (shape contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.config import Config
from handpose_tpu.models import build_model
from handpose_tpu.nn.mano import synthetic_mano

B, S = 2, 64  # tiny spatial size for test speed

BASE = Config(batch_size=B, input_img_shape=(S, S),
              resnet_out_feature_dim=256, condition_feat_dim=32,
              num_timesteps=8, num_sampling_timesteps=4)


def _inputs(cfg):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.5, 0.5, (B, S, S, cfg.input_channels)),
                      jnp.float32)
    K = jnp.tile(jnp.asarray([[320., 0., S / 2], [0., 320., S / 2],
                              [0., 0., 1.]]), (B, 1, 1))
    scale = jnp.ones((B, 1))
    root = jnp.zeros((B, 3))
    pose_x0 = jnp.asarray(rng.uniform(size=(B, 1, 63)), jnp.float32)
    return img, K, scale, root, pose_x0


MODELS = [
    ("TwoDimHandPose", dict(input_channels=3)),
    ("TwoDimHandPoseWithFK", dict(input_channels=3)),
    ("ThreeDimHandPose", dict(input_channels=3)),
    ("OnlyThreeDimHandPose", dict(input_channels=3)),
    ("DiffusionHandPose", dict(input_channels=3)),
    ("MANO3DHandPose", dict(input_channels=3)),
    ("ThreeHandShapeAndPoseMANO", dict(input_channels=24)),
    ("Resnet50MANO3DHandPose", dict(input_channels=24)),
    ("Hand3DPoseNet", dict(input_channels=3)),
    ("Hand3DPosePriorNetwork", dict(input_channels=21)),
]


@pytest.mark.parametrize("name,over", MODELS)
def test_model_forward(name, over):
    cfg = BASE.replace(model_name=name, **over)
    model = build_model(cfg, mano=synthetic_mano())
    img, K, scale, root, pose_x0 = _inputs(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1)}
    variables = model.init(rngs, img, K, scale, root, pose_x0, train=False)
    out = model.apply(variables, img, K, scale, root, pose_x0, train=False,
                      rngs={"diffusion": jax.random.PRNGKey(2)})

    if name in ("Hand3DPoseNet", "Hand3DPosePriorNetwork"):
        assert out.coord_xyz_rel_normed.shape == (B, 21, 3)
        assert out.can_xyz.shape == (B, 21, 3)
        assert out.rot_mat.shape == (B, 3, 3)
    elif name == "TwoDimHandPose":
        assert out.uv.shape == (B, 21, 2)
        assert out.xyz is None
    else:
        assert out.xyz.shape == (B, 21, 3)
        if name != "ThreeHandShapeAndPoseMANO":
            assert out.uv.shape == (B, 21, 2)
    if name == "Resnet50MANO3DHandPose":
        assert out.theta.shape[1] == BASE.mano_pose_num
        assert out.beta.shape == (B, 10)
    if name == "DiffusionHandPose":
        assert np.isfinite(out.diffusion_loss)


def test_inference_mode_models():
    for name, ch in [("Hand3DPoseNet", 3), ("Hand3DPosePriorNetwork", 21),
                     ("TwoDimHandPoseWithFK", 3)]:
        cfg = BASE.replace(model_name=name, input_channels=ch)
        model = build_model(cfg, is_inference=True, mano=synthetic_mano())
        img, K, scale, root, pose_x0 = _inputs(cfg)
        rngs = {"params": jax.random.PRNGKey(0),
                "diffusion": jax.random.PRNGKey(1)}
        variables = model.init(rngs, img, K, scale, root, pose_x0)
        out = model.apply(variables, img, K, scale, root, pose_x0)
        assert out.xyz.shape == (B, 21, 3)
        assert out.uv.shape == (B, 21, 2)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        build_model(BASE.replace(model_name="NoSuchModel"))


def test_ddim_sample_stops_gradients():
    """In-training DDIM sampling must not backprop into the denoiser.

    Reference semantics: every sampler is @torch.no_grad (reference
    conditionalDiffusion.py:649-742), so the xyz/uv loss path reaches the
    UNet only through a stop_gradient; the UNet trains solely via
    diffusion_loss.
    """
    cfg = BASE.replace(model_name="DiffusionHandPose", input_channels=3)
    model = build_model(cfg)
    img, K, scale, root, pose_x0 = _inputs(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1)}
    variables = model.init(rngs, img, K, scale, root, pose_x0, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def apply(p, which):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            img, K, scale, root, pose_x0, train=True,
            rngs={"diffusion": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        if which == "xyz":
            return jnp.sum(out.xyz ** 2) + jnp.sum(out.uv ** 2)
        return out.diffusion_loss

    unet_key = next(k for k in params if "diff" in k.lower())

    g_xyz = jax.grad(lambda p: apply(p, "xyz"))(params)
    unet_norm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree.leaves(g_xyz[unet_key]))
    assert unet_norm == 0.0, "xyz/uv loss leaked gradients into the denoiser"
    bone_key = next(k for k in params if "bone_angle" in k.lower())
    bone_norm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree.leaves(g_xyz[bone_key]))
    assert bone_norm > 0.0, "FK branch should still receive gradients"

    g_diff = jax.grad(lambda p: apply(p, "diffusion"))(params)
    unet_norm2 = sum(float(jnp.sum(jnp.abs(g)))
                     for g in jax.tree.leaves(g_diff[unet_key]))
    assert unet_norm2 > 0.0, "diffusion_loss must still train the denoiser"
