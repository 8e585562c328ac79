"""Full-model weight-transfer parity vs the executed torch reference.

Extends the Unet1D technique (test_diffusion_parity.py) to whole zoo
models: construct the reference torch model (with a faithful local
torchvision-ResNet stand-in -- no egress), port every weight into the Flax
model's parameter tree, and assert forward equality on fixture inputs.
This is the strongest accuracy-parity evidence obtainable without
pretrained weights: it pins the numerics of backbone + heads + FK / MANO
composition end to end (reference ThreeDimHandPose.py:18-51,
MANO3DHandPose.py:18-73).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
import torchvision_shim

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

torchvision_shim.install()
sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_torch_resnet import convert_state_dict  # noqa: E402

from handpose_tpu.config import Config  # noqa: E402
from handpose_tpu.models import build_model  # noqa: E402

FEAT_DIM = 256   # small trunk fc keeps the test fast; same decay structure


def _lin(m):
    return {"kernel": np.asarray(m.weight.detach().numpy().T),
            "bias": np.asarray(m.bias.detach().numpy())}


def _seq_to_mlp(tseq):
    """torch Sequential(build_sequtial) -> flax DecayMLP param dict."""
    linears = [m for m in tseq if isinstance(m, torch.nn.Linear)]
    return {f"Dense_{i}": _lin(m) for i, m in enumerate(linears)}


def _randomize_bn(tmodel):
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def _extractor_params(textractor):
    """Reference ResNetFeatureExtractor -> flax params/batch_stats."""
    sd = {k: v.numpy() for k, v in
          textractor.feature_extractor.state_dict().items()}
    trunk_p, trunk_s = convert_state_dict(sd, [3, 4, 6, 3],
                                          block="bottleneck",
                                          skip_stem=False)
    params = {"trunk": trunk_p, "fc_proj": _lin(textractor.fc)}
    return params, {"trunk": trunk_s}


def _ref_config(**over):
    import config.config as refcfg
    for k, v in over.items():
        setattr(refcfg, k, v)
    return refcfg


def _inputs(seed=0, B=2, S=64):
    rng = np.random.default_rng(seed)
    img = rng.uniform(-0.5, 0.5, (B, S, S, 3)).astype(np.float32)
    K = np.tile(np.asarray([[320., 0., S / 2], [0., 320., S / 2],
                            [0., 0., 1.]], np.float32), (B, 1, 1))
    scale = np.full((B, 1), 0.8, np.float32)
    root = rng.normal(scale=0.1, size=(B, 3)).astype(np.float32) + \
        np.asarray([0, 0, 0.6], np.float32)
    return img, K, scale, root


def transfer_threedimhandpose(tm):
    """torch ThreeDimHandPose -> flax (params, batch_stats) trees.

    Shared by the forward-parity test below and the twin-training
    convergence harness (tools/twin_train_parity.py).
    """
    ext_p, ext_s = _extractor_params(tm.resnet_extractor)
    params = {
        "resnet_extractor": ext_p,
        "threeDimPoseEstimate": _seq_to_mlp(tm.threeDimPoseEstimate),
        "bone_angle_pred_model": {
            "mlp1": _seq_to_mlp(tm.bone_angle_pred_model.mlp1),
            "mlp2": _seq_to_mlp(tm.bone_angle_pred_model.mlp2)},
        "bone_length_pred_model": {
            "mlp1": _seq_to_mlp(tm.bone_length_pred_model.mlp1)},
    }
    stats = {"resnet_extractor": ext_s}
    return params, stats


def transfer_flagship(tm):
    """torch Hand3DPosePriorNetwork -> flax (params, batch_stats) trees
    (twin ResNet-18 backbones + MLP heads).  Shared with
    tools/twin_train_parity.py."""
    def head(tnet):
        sd = {k: v.numpy() for k, v in
              tnet.extended_resnet18_extractor.feature_extractor
              .state_dict().items()}
        p, s = convert_state_dict(sd, [2, 2, 2, 2], block="basic",
                                  skip_stem=False)
        return ({"backbone": {"trunk": p}, "mlp": _seq_to_mlp(tnet.mlp)},
                {"backbone": {"trunk": s}})

    pp_p, pp_s = head(tm.PosePrior_net)
    vp_p, vp_s = head(tm.ViewPoint_net)
    return ({"PosePrior_net": pp_p, "ViewPoint_net": vp_p},
            {"PosePrior_net": pp_s, "ViewPoint_net": vp_s})


def transfer_twodimhandpose(tm):
    """torch TwoDimHandPose -> flax (params, batch_stats) trees.  Shared
    by the forward-parity test and tools/twin_train_parity.py."""
    ext_p, ext_s = _extractor_params(tm.resnet_extractor)
    params = {"resnet_extractor": ext_p,
              "twoDimPoseEstimate": _seq_to_mlp(tm.twoDimPoseEstimate)}
    return params, {"resnet_extractor": ext_s}


def transfer_twodimhandposewithfk(tm):
    """torch TwoDimHandPoseWithFK -> flax (params, batch_stats) trees.
    Shared by the forward-parity test and tools/twin_train_parity.py."""
    ext_p, ext_s = _extractor_params(tm.resnet_extractor)
    params = {
        "resnet_extractor": ext_p,
        "twoDimPoseEstimate": _seq_to_mlp(tm.twoDimPoseEstimate),
        "boneAngle": {"mlp1": _seq_to_mlp(tm.boneAngle.mlp1),
                      "mlp2": _seq_to_mlp(tm.boneAngle.mlp2)},
        "bonelength": {"mlp1": _seq_to_mlp(tm.bonelength.mlp1)},
    }
    return params, {"resnet_extractor": ext_s}


def transfer_resnet50mano(tm):
    """torch Resnet50MANO3DHandPose -> flax (params, batch_stats) trees.
    Shared by the forward-parity test and tools/twin_train_parity.py."""
    sd = {k: v.numpy() for k, v in tm.mano_model
          .extended_resnet50_extractor.feature_extractor
          .state_dict().items()}
    trunk_p, trunk_s = convert_state_dict(sd, [3, 4, 6, 3],
                                          block="bottleneck",
                                          skip_stem=False)
    params = {"extended_resnet50_extractor": {"trunk": trunk_p},
              "mlp": _seq_to_mlp(tm.mano_model.mlp)}
    stats = {"extended_resnet50_extractor": {"trunk": trunk_s}}
    return params, stats


def transfer_onlythreedimhandpose(tm):
    """torch OnlyThreeDimHandPose -> flax (params, batch_stats) trees.
    Shared by the forward-parity test and the checkpoint converter."""
    ext_p, ext_s = _extractor_params(tm.resnet_extractor)
    params = {"resnet_extractor": ext_p,
              "threeDimPoseEstimate": _seq_to_mlp(tm.threeDimPoseEstimate)}
    return params, {"resnet_extractor": ext_s}


def transfer_hand3dposenet(tm):
    """torch Hand3DPoseNet -> flax (params, batch_stats) trees.  Shared
    by the forward-parity test and the checkpoint converter."""
    ext_p, ext_s = _extractor_params(tm.resnet_extractor)
    params = {
        "resnet_extractor": ext_p,
        "pose_predictor": {"mlp": _seq_to_mlp(tm.pose_predictor.mlp)},
        "view_point_predictor": {
            "mlp": _seq_to_mlp(tm.view_point_predictor.mlp),
            "fc_vp_ux": _lin(tm.view_point_predictor.fc_vp_ux),
            "fc_vp_uy": _lin(tm.view_point_predictor.fc_vp_uy),
            "fc_vp_uz": _lin(tm.view_point_predictor.fc_vp_uz)},
    }
    return params, {"resnet_extractor": ext_s}


def transfer_threehandshapeandpose(tm):
    """torch ThreeHandShapeAndPoseMANO -> flax (params, batch_stats)
    trees.  Shared by the forward-parity test and
    tools/twin_train_parity.py.

    The hand-rolled boukhayma net uses torchvision param naming
    (layerX.Y.convZ / downsample), so the standard converter ports
    layers1-4 + fc; the dual stem (conv1 3ch / conv11 24ch) is mapped by
    its torch name -- only the traced stem exists in the flax tree."""
    sd = {k: v.numpy() for k, v in tm.resnet_Mano.state_dict().items()
          if not k.startswith("mano_layer")}
    trunk_p, trunk_s = convert_state_dict(sd, [3, 4, 6, 3], block="basic",
                                          skip_stem=True)
    trunk_p["conv1"] = {"kernel": np.transpose(sd["conv1.weight"],
                                               (2, 3, 1, 0))}
    trunk_p["bn1"] = {"scale": sd["bn1.weight"], "bias": sd["bn1.bias"]}
    trunk_s["bn1"] = {"mean": sd["bn1.running_mean"],
                      "var": sd["bn1.running_var"]}
    return {"resnet_Mano": trunk_p}, {"resnet_Mano": trunk_s}


def transfer_diffusionhandpose(tm):
    """torch DiffusionHandPose -> flax (params, batch_stats) trees.
    Shared by the forward-parity test and tools/twin_train_parity.py."""
    from test_diffusion_parity import build_unet_params

    ext_p, ext_s = _extractor_params(tm.resnet_extractor)
    params = {
        "resnet_extractor": ext_p,
        "diff_model": {"unet": build_unet_params(
            tm.diff_model.Unet1D_Model)},
        "bone_angle_pred_model": {
            "mlp1": _seq_to_mlp(tm.bone_angle_pred_model.mlp1),
            "mlp2": _seq_to_mlp(tm.bone_angle_pred_model.mlp2)},
        "bone_length_pred_model": {
            "mlp1": _seq_to_mlp(tm.bone_length_pred_model.mlp1)},
    }
    return params, {"resnet_extractor": ext_s}


def transfer_mano3dhandpose(tm):
    """torch MANO3DHandPose -> flax (params, batch_stats) trees.  Shared
    with tools/twin_train_parity.py."""
    ext_p, ext_s = _extractor_params(tm.resnet_extractor)
    params = {
        "resnet_extractor": ext_p,
        "theta_predictor": {"mlp1": _seq_to_mlp(tm.theta_predictor.mlp1),
                            "mlp2": _seq_to_mlp(tm.theta_predictor.mlp2)},
        "betas_predictor": {"mlp": _seq_to_mlp(tm.betas_predictor.mlp)},
    }
    return params, {"resnet_extractor": ext_s}


def test_threedimhandpose_transfer_parity():
    """FK-family end-to-end numerics (reference ThreeDimHandPose.py)."""
    _ref_config(input_channels=3, keypoint_num=21,
                resnet_out_feature_dim=FEAT_DIM, joint_order_switched=True,
                other_joint_angles_num=23, bone_length_num=20)
    from network.ThreeDimHandPose import ThreeDimHandPose as TorchM3

    torch.manual_seed(0)
    tm = TorchM3(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="ThreeDimHandPose", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, compute_dtype="float32",
                 joint_order_switched=True)
    model = build_model(cfg)
    img, K, scale, root = _inputs()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_threedimhandpose(tm)

    # structural check: transferred tree covers the flax tree exactly
    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (t_xyz, t_uv, _), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.xyz), t_xyz.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.uv), t_uv.numpy(),
                               atol=0.5, rtol=1e-3)


def test_mano3dhandpose_transfer_parity():
    """MANO-family end-to-end numerics (reference MANO3DHandPose.py)."""
    mano_pkl = os.path.join(REF, "config", "mano", "models",
                            "MANO_RIGHT.pkl")
    if not os.path.exists(mano_pkl):
        pytest.skip("MANO asset not available")
    _ref_config(input_channels=3, keypoint_num=21,
                resnet_out_feature_dim=FEAT_DIM, joint_order_switched=True,
                mano_pose_num=10, mano_beta_num=10,
                mano_right_hand_path=mano_pkl)
    from network.MANO3DHandPose import MANO3DHandPose as TorchM6

    torch.manual_seed(1)
    tm = TorchM6(device="cpu", mano_right_hand_path=mano_pkl).eval()
    _randomize_bn(tm)

    from handpose_tpu.nn.mano import load_mano
    cfg = Config(model_name="MANO3DHandPose", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, compute_dtype="float32",
                 mano_pose_num=10, joint_order_switched=True)
    model = build_model(cfg, mano=load_mano(mano_pkl))
    img, K, scale, root = _inputs(seed=1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_mano3dhandpose(tm)
    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (t_xyz, t_uv, _), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.xyz), t_xyz.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.uv), t_uv.numpy(),
                               atol=0.5, rtol=1e-3)


def test_flagship_transfer_parity():
    """Canonical+viewpoint family end-to-end numerics on the flagship
    (reference Hand3DPosePriorNetwork.py:20-50): twin ResNet-18 backbones
    + MLP heads + axis-angle rotation assembly."""
    _ref_config(input_channels=21, keypoint_num=21, is_inference=False,
                joint_order_switched=True)
    from network.Hand3DPosePriorNetwork import (
        Hand3DPosePriorNetwork as TorchM10)

    torch.manual_seed(2)
    tm = TorchM10(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="Hand3DPosePriorNetwork", input_channels=21,
                 compute_dtype="float32", joint_order_switched=True)
    model = build_model(cfg)
    rng = np.random.default_rng(2)
    B, S = 2, 64
    img = rng.uniform(0, 1, (B, S, S, 21)).astype(np.float32)
    K = np.tile(np.asarray([[320., 0., S / 2], [0., 320., S / 2],
                            [0., 0., 1.]], np.float32), (B, 1, 1))
    scale = np.full((B, 1), 0.8, np.float32)
    root = np.asarray([[0, 0, 0.6]] * B, np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_flagship(tm)
    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (t_rel, t_can, t_rot), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.can_xyz), t_can.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.rot_mat), t_rot.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.coord_xyz_rel_normed),
                               t_rel.numpy(), atol=3e-3, rtol=1e-3)


def test_twodimhandposewithfk_transfer_parity():
    """2D-head + FK family (reference TwoDimHandPoseWithFK.py:18-84), with
    the uv_from_xD=2.5 blend path.  The reference's training-mode return is
    a 2-tuple (documented bit-rot, TwoDimHandPoseWithFK.py:84)."""
    _ref_config(input_channels=3, keypoint_num=21, is_inference=False,
                resnet_out_feature_dim=FEAT_DIM, joint_order_switched=True,
                other_joint_angles_num=23, bone_length_num=20,
                uv_from_xD=2.5)
    from network.TwoDimHandPoseWithFK import TwoDimHandPoseWithFK as TorchM2

    torch.manual_seed(6)
    tm = TorchM2(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="TwoDimHandPoseWithFK", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, compute_dtype="float32",
                 joint_order_switched=True, uv_from_xd=2.5)
    model = build_model(cfg)
    img, K, scale, root = _inputs(seed=6)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_twodimhandposewithfk(tm)
    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (t_xyz, t_uv, _), _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.xyz), t_xyz.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.uv), t_uv.numpy(),
                               atol=0.5, rtol=1e-3)


def test_onlythreedimhandpose_transfer_parity():
    """Direct-regression family (reference OnlyThreeDimHandPose.py:16-43):
    backbone -> 63-d xyz -> pinhole projection, no FK."""
    _ref_config(input_channels=3, keypoint_num=21,
                resnet_out_feature_dim=FEAT_DIM)
    from network.OnlyThreeDimHandPose import OnlyThreeDimHandPose as TorchM4

    torch.manual_seed(7)
    tm = TorchM4(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, compute_dtype="float32")
    model = build_model(cfg)
    img, K, scale, root = _inputs(seed=7)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_onlythreedimhandpose(tm)
    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (t_xyz, t_uv, _), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.xyz), t_xyz.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.uv), t_uv.numpy(),
                               atol=0.05, rtol=1e-4)


def test_hand3dposenet_transfer_parity():
    """Canonical+viewpoint MLP family (reference Hand3DPoseNet.py:19-53):
    ResNet features -> Pose3dPrediction + ViewPointPrediction -> axis-angle
    rotation assembly, training-mode outputs."""
    _ref_config(input_channels=3, keypoint_num=21, is_inference=False,
                resnet_out_feature_dim=FEAT_DIM)
    from network.Hand3DPoseNet import Hand3DPoseNet as TorchM9

    torch.manual_seed(8)
    tm = TorchM9(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="Hand3DPoseNet", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, compute_dtype="float32")
    model = build_model(cfg)
    img, K, scale, root = _inputs(seed=8)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_hand3dposenet(tm)
    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (t_rel, t_can, t_rot), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.can_xyz), t_can.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rot_mat), t_rot.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.coord_xyz_rel_normed),
                               t_rel.numpy(), atol=2e-4, rtol=1e-4)


def test_diffusionhandpose_transfer_parity():
    """Diffusion family end-to-end numerics (reference DiffusionHandPose.py
    :19-52): condition extractor -> DDIM sampling -> bone heads -> FK.

    DDIM with eta=0 (conditionalDiffusion.py:495) is deterministic given
    the initial x_T, which the reference draws as its first RNG use inside
    the forward (ddim_sample:683) -- capture it by seed replay and inject
    the same x_T into our sampler (``init_noise``), making the whole
    forward comparable despite the stochastic sampler.  T=20/10 keeps the
    DDIM branch (sampling < T) while bounding accumulated float drift."""
    _ref_config(input_channels=3, keypoint_num=21, is_inference=False,
                resnet_out_feature_dim=FEAT_DIM, condition_feat_dim=64,
                joint_order_switched=True, other_joint_angles_num=23,
                bone_length_num=20, num_timesteps=20,
                num_sampling_timesteps=10, batch_size=2)
    from network.DiffusionHandPose import DiffusionHandPose as TorchM5

    torch.manual_seed(9)
    tm = TorchM5(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="DiffusionHandPose", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, condition_feat_dim=64,
                 compute_dtype="float32", joint_order_switched=True,
                 num_timesteps=20, num_sampling_timesteps=10)
    model = build_model(cfg)
    img, K, scale, root = _inputs(seed=9)
    B = img.shape[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
        jnp.asarray(root), train=False)

    params, stats = transfer_diffusionhandpose(tm)
    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    # capture the x_T the reference will draw: its forward's first RNG use
    torch.manual_seed(123)
    x_T = torch.randn(B, 1, 63).numpy()
    pose_x0 = np.random.default_rng(9).uniform(
        0, 1, (B, 1, 63)).astype(np.float32)
    torch.manual_seed(123)
    with torch.no_grad():
        (t_xyz, t_uv, _), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root),
            torch.tensor(pose_x0))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False,
                      init_noise=jnp.asarray(x_T),
                      rngs={"diffusion": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out.xyz), t_xyz.numpy(),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.uv), t_uv.numpy(),
                               atol=1.0, rtol=1e-3)


def test_threehandshapeandpose_transfer_parity():
    """boukhayma-family end-to-end numerics (reference
    ThreeHandShapeAndPoseMANO.py + resnetMANO.py:138-235), at 256px so the
    torch ``AvgPool2d(7)`` top-left-window quirk on the 8x8 final map is
    exercised (resnetMANO.py:158)."""
    mano_pkl = os.path.join(REF, "config", "mano", "models",
                            "MANO_RIGHT.pkl")
    if not os.path.exists(mano_pkl):
        pytest.skip("MANO asset not available")
    _ref_config(input_channels=3, keypoint_num=21, mano_pose_num=10,
                network_regress_uv=False, joint_order_switched=True,
                mano_right_hand_path=mano_pkl)
    from network.ThreeHandShapeAndPoseMANO import (
        ThreeHandShapeAndPoseMANO as TorchM7)

    torch.manual_seed(4)
    tm = TorchM7(device="cpu", mano_right_hand_path=mano_pkl).eval()
    _randomize_bn(tm)

    from handpose_tpu.nn.mano import load_mano
    cfg = Config(model_name="ThreeHandShapeAndPoseMANO", input_channels=3,
                 compute_dtype="float32", mano_pose_num=10,
                 network_regress_uv=False, joint_order_switched=True)
    model = build_model(cfg, mano=load_mano(mano_pkl))
    img, K, scale, root = _inputs(seed=4, B=2, S=256)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_threehandshapeandpose(tm)

    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (t_xyz, t_uv, _), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))
    assert t_uv is None

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    assert out.uv is None
    np.testing.assert_allclose(np.asarray(out.xyz), t_xyz.numpy(),
                               atol=2e-3, rtol=1e-3)


def test_resnet50mano3dhandpose_transfer_parity():
    """Resnet50MANO-family end-to-end numerics (reference
    Resnet50MANO3DHandPose.py + resnet50MANO.py:38-87): torchvision-style
    ResNet-50 -> sigmoid decay-MLP -> scaled (rot, theta, beta) -> MANO ->
    pinhole projection."""
    mano_pkl = os.path.join(REF, "config", "mano", "models",
                            "MANO_RIGHT.pkl")
    if not os.path.exists(mano_pkl):
        pytest.skip("MANO asset not available")
    _ref_config(input_channels=3, keypoint_num=21, mano_pose_num=10,
                network_regress_uv=False, joint_order_switched=True,
                mano_right_hand_path=mano_pkl)
    from network.Resnet50MANO3DHandPose import (
        Resnet50MANO3DHandPose as TorchM8)

    torch.manual_seed(5)
    tm = TorchM8(device="cpu", mano_right_hand_path=mano_pkl).eval()
    _randomize_bn(tm)

    from handpose_tpu.nn.mano import load_mano
    cfg = Config(model_name="Resnet50MANO3DHandPose", input_channels=3,
                 compute_dtype="float32", mano_pose_num=10,
                 network_regress_uv=False, joint_order_switched=True)
    model = build_model(cfg, mano=load_mano(mano_pkl))
    img, K, scale, root = _inputs(seed=5)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_resnet50mano(tm)

    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (t_xyz, t_uv, _), _, (t_theta, t_beta) = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.theta), t_theta.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.beta), t_beta.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.xyz), t_xyz.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.uv), t_uv.numpy(),
                               atol=0.5, rtol=1e-3)


def test_twodimhandpose_transfer_parity():
    """uv-family end-to-end numerics (reference TwoDimHandPose.py:16-62).

    The reference crashes on construction from its `config.eypoint_num`
    typo (TwoDimHandPose.py:30); set the misspelled attribute so the
    original code executes as intended.
    """
    refcfg = _ref_config(input_channels=3, keypoint_num=21,
                         resnet_out_feature_dim=FEAT_DIM)
    refcfg.eypoint_num = 21
    from network.TwoDimHandPose import TwoDimHandPose as TorchM1

    torch.manual_seed(3)
    tm = TorchM1(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="TwoDimHandPose", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, compute_dtype="float32")
    model = build_model(cfg)
    img, K, scale, root = _inputs(seed=3)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)

    params, stats = transfer_twodimhandpose(tm)
    ours = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, variables["params"]))
    theirs = jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    assert ours == theirs

    with torch.no_grad():
        (_, t_uv, _), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
                      jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.uv), t_uv.numpy(),
                               atol=0.05, rtol=1e-4)
