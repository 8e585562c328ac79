"""The ten-model hand-pose zoo on one uniform forward contract.

TPU-native rebuild of reference network/*.py (M1-M10 in SURVEY.md §2).
Every model is a Flax module with the call signature

    model.apply(vars, input, camera_intrinsic_matrix,
                index_root_bone_length, keypoint_xyz_root, pose_x0,
                train=..., rngs=...) -> ModelOutput

mirroring the reference contract (trainval.py:309-328) but with an explicit
typed output instead of positionally-overloaded lists, and with
``is_inference`` a static constructor argument instead of a mutated global
(reference config.py:82 / trainval.py:41).

Reference bit-rot deliberately fixed (SURVEY.md §7 "hard parts" #8):
* TwoDimHandPose's ``config.eypoint_num`` typo (TwoDimHandPose.py:30);
* TwoDimHandPoseWithFK returning a 2-tuple the trainer can't unpack
  (TwoDimHandPoseWithFK.py:84) -- here every model returns ModelOutput.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..config import Config
from ..nn.diffusion import DiffusionJointEstimation
from ..nn.fk import forward_kinematics
from ..nn.heads import (BoneAnglePrediction, BoneLengthPrediction,
                        MANOBetasPrediction, MANOThetaPrediction, PosePrior,
                        Pose3dPrediction, ViewPoint, ViewPointPrediction)
from ..nn.mano import ManoLayer, ManoModel, load_mano
from ..nn.resnet import (ExtendedResNet50, ResNetFeatureExtractor, ResNetMano)
from ..ops.projection import batch_project_xyz_to_uv, rel_normed_to_absolute
from ..ops.rotations import axis_angle_rot_mat

_PI = math.pi


def _dt(cfg: Config):
    """Backbone compute dtype (bfloat16 on TPU; geometry stays f32)."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


@flax.struct.dataclass
class ModelOutput:
    """Typed replacement for the reference's
    ``([xyz, uv, aux], diffusion_loss, [theta, beta])`` convention."""

    xyz: Optional[jnp.ndarray] = None         # (B, 21, 3) absolute coords
    uv: Optional[jnp.ndarray] = None          # (B, 21, 2) pixel coords
    uv_aux: Optional[jnp.ndarray] = None      # direct-2D branch (M2 infer)
    diffusion_loss: Optional[jnp.ndarray] = None
    theta: Optional[jnp.ndarray] = None       # MANO pose params (M8)
    beta: Optional[jnp.ndarray] = None        # MANO shape params (M8)
    # trainer-B training outputs (reference Hand3DPoseNet.py:49-52)
    coord_xyz_rel_normed: Optional[jnp.ndarray] = None
    can_xyz: Optional[jnp.ndarray] = None     # canonical coords (B, 21, 3)
    rot_mat: Optional[jnp.ndarray] = None     # viewpoint rotation (B, 3, 3)


class _TwoDimMLP(nn.Module):
    """The explicit 5-layer sigmoid uv head shared by M1/M2
    (reference TwoDimHandPose.py:21-34)."""

    feat_dim: int
    keypoint_num: int

    @nn.compact
    def __call__(self, x):
        d = self.feat_dim
        for i in range(1, 5):
            x = nn.Dense(d // (2 ** i))(x)
            x = nn.relu(x)
        x = nn.Dense(self.keypoint_num * 2)(x)
        return nn.sigmoid(x)


class TwoDimHandPose(nn.Module):
    """M1: ResNet-50 -> MLP -> 21 x (u, v) (reference TwoDimHandPose.py)."""

    cfg: Config

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        B, h, w = img.shape[0], img.shape[1], img.shape[2]
        feat = ResNetFeatureExtractor(self.cfg.resnet_out_feature_dim,
                                      bn_variance=self.cfg.bn_mode,
                                      pool_grad=self.cfg.pool_grad,
                                      dtype=_dt(self.cfg),
                                      stem=self.cfg.resnet_stem,
                                      name="resnet_extractor")(img, train)
        pose = _TwoDimMLP(self.cfg.resnet_out_feature_dim,
                          self.cfg.keypoint_num,
                          name="twoDimPoseEstimate")(feat)
        pose = pose.reshape(B, -1, 2)
        uv = jnp.stack([pose[..., 0] * w, pose[..., 1] * h], axis=-1)
        return ModelOutput(uv=uv, diffusion_loss=jnp.zeros(()))


class TwoDimHandPoseWithFK(nn.Module):
    """M2: 2D uv head -> bone angle/length heads -> FK -> xyz + projected uv
    (reference TwoDimHandPoseWithFK.py)."""

    cfg: Config
    is_inference: bool = False

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        B, h, w = img.shape[0], img.shape[1], img.shape[2]
        kp = self.cfg.keypoint_num
        feat = ResNetFeatureExtractor(self.cfg.resnet_out_feature_dim,
                                      bn_variance=self.cfg.bn_mode,
                                      pool_grad=self.cfg.pool_grad,
                                      dtype=_dt(self.cfg),
                                      stem=self.cfg.resnet_stem,
                                      name="resnet_extractor")(img, train)
        pose = _TwoDimMLP(self.cfg.resnet_out_feature_dim, kp,
                          name="twoDimPoseEstimate")(feat)
        pose = pose.reshape(B, -1, 2)
        uv_direct = jnp.stack([pose[..., 0] * w, pose[..., 1] * h], axis=-1)
        flat = uv_direct.reshape(B, -1)
        root_angles, other_angles = BoneAnglePrediction(
            input_dim=kp * 2, name="boneAngle")(flat)
        bone_lengths = BoneLengthPrediction(
            input_dim=kp * 2, name="bonelength")(flat)
        xyz, uv_proj = forward_kinematics(
            root_angles, other_angles, bone_lengths, camera_intrinsic_matrix,
            index_root_bone_length, keypoint_xyz_root,
            joint_order_switched=self.cfg.joint_order_switched)
        if self.is_inference:
            return ModelOutput(xyz=xyz, uv=uv_proj, uv_aux=uv_direct,
                               diffusion_loss=jnp.zeros(()))
        if self.cfg.uv_from_xd == 2.5:
            uv = (uv_direct + uv_proj) / 2
        elif self.cfg.uv_from_xd == 3:
            uv = uv_proj
        else:
            uv = uv_direct
        return ModelOutput(xyz=xyz, uv=uv, diffusion_loss=jnp.zeros(()))


class ThreeDimHandPose(nn.Module):
    """M3: direct 63-d xyz -> bone heads -> FK refine
    (reference ThreeDimHandPose.py)."""

    cfg: Config

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        from ..nn.mlp import DecayMLP
        feat = ResNetFeatureExtractor(self.cfg.resnet_out_feature_dim,
                                      bn_variance=self.cfg.bn_mode,
                                      pool_grad=self.cfg.pool_grad,
                                      dtype=_dt(self.cfg),
                                      stem=self.cfg.resnet_stem,
                                      name="resnet_extractor")(img, train)
        pose63 = DecayMLP(self.cfg.resnet_out_feature_dim,
                          self.cfg.keypoint_num * 3, divide=2,
                          activation="LeakyReLU", use_sigmoid=False,
                          name="threeDimPoseEstimate")(feat)
        root_angles, other_angles = BoneAnglePrediction(
            name="bone_angle_pred_model")(pose63)
        bone_lengths = BoneLengthPrediction(
            name="bone_length_pred_model")(pose63)
        xyz, uv = forward_kinematics(
            root_angles, other_angles, bone_lengths, camera_intrinsic_matrix,
            index_root_bone_length, keypoint_xyz_root,
            joint_order_switched=self.cfg.joint_order_switched)
        return ModelOutput(xyz=xyz, uv=uv, diffusion_loss=jnp.zeros(()))


class OnlyThreeDimHandPose(nn.Module):
    """M4: direct 63-d xyz, projected uv, no FK
    (reference OnlyThreeDimHandPose.py)."""

    cfg: Config

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        from ..nn.mlp import DecayMLP
        B = img.shape[0]
        feat = ResNetFeatureExtractor(self.cfg.resnet_out_feature_dim,
                                      bn_variance=self.cfg.bn_mode,
                                      pool_grad=self.cfg.pool_grad,
                                      dtype=_dt(self.cfg),
                                      stem=self.cfg.resnet_stem,
                                      name="resnet_extractor")(img, train)
        pose63 = DecayMLP(self.cfg.resnet_out_feature_dim,
                          self.cfg.keypoint_num * 3, divide=2,
                          activation="LeakyReLU", use_sigmoid=False,
                          name="threeDimPoseEstimate")(feat)
        xyz = pose63.reshape(B, -1, 3)
        uv = batch_project_xyz_to_uv(xyz, camera_intrinsic_matrix)
        return ModelOutput(xyz=xyz, uv=uv)


class DiffusionHandPose(nn.Module):
    """M5: conditional DDIM pose sampler -> bone heads -> FK refine
    (reference DiffusionHandPose.py).

    The reference runs the 200-step DDIM loop on *every* training forward;
    here that stays the default for semantic parity
    (``cfg.diffusion_sample_in_train``), but can be disabled -- then
    training optimises only the denoiser objective and the FK branch is
    skipped (xyz/uv outputs None).
    """

    cfg: Config

    def setup(self):
        self.resnet_extractor = ResNetFeatureExtractor(
            self.cfg.condition_feat_dim, dtype=_dt(self.cfg),
            bn_variance=self.cfg.bn_mode,
            pool_grad=self.cfg.pool_grad,
            stem=self.cfg.resnet_stem)
        self.diff_model = DiffusionJointEstimation(
            keypoint_num=self.cfg.keypoint_num,
            condition_feat_dim=self.cfg.condition_feat_dim,
            num_timesteps=self.cfg.num_timesteps,
            num_sampling_timesteps=self.cfg.num_sampling_timesteps,
            sampler_unroll=self.cfg.sampler_unroll,
            sampler_hoist={"auto": "auto", "on": True,
                           "off": False}[self.cfg.sampler_hoist])
        self.bone_angle_pred_model = BoneAnglePrediction()
        self.bone_length_pred_model = BoneLengthPrediction()

    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False, init_noise=None,
                 diff_t=None, diff_noise=None):
        feat = self.resnet_extractor(img, train)
        sample_now = (not train) or self.cfg.diffusion_sample_in_train

        diffusion_loss = None
        if pose_x0 is not None:
            # diff_t / diff_noise: optional injected loss draws (lockstep
            # twin-training parity vs the executed torch reference)
            diffusion_loss = self.diff_model(
                pose_x0, feat, self.make_rng("diffusion"),
                t=diff_t, noise=diff_noise)

        if not sample_now:
            return ModelOutput(diffusion_loss=diffusion_loss)

        if self.is_initializing() and pose_x0 is None:
            # create the denoiser's params with an eager call: a first call
            # inside the sampler's lax.scan would leak scan tracers into the
            # initialized param tree
            dummy = jnp.zeros((feat.shape[0], 1, self.cfg.keypoint_num * 3))
            self.diff_model(dummy, feat, self.make_rng("diffusion"))

        # init_noise: optional injected x_T (B, 1, 63) -- with DDIM eta=0
        # the whole forward is then deterministic (reproducible serving;
        # whole-model torch-parity testing)
        coarse = self.diff_model.sample(feat, self.make_rng("diffusion"),
                                        init_noise=init_noise)
        # every reference sampler is @torch.no_grad (reference
        # conditionalDiffusion.py:649,658,674,713,742), so the in-training
        # DDIM sample must not backprop into the UNet (or the condition
        # branch through it); the denoiser trains only via diffusion_loss
        coarse = jax.lax.stop_gradient(coarse)
        coarse = coarse.reshape(coarse.shape[0], -1)          # (B, 63)
        root_angles, other_angles = self.bone_angle_pred_model(coarse)
        bone_lengths = self.bone_length_pred_model(coarse)
        xyz, uv = forward_kinematics(
            root_angles, other_angles, bone_lengths, camera_intrinsic_matrix,
            index_root_bone_length, keypoint_xyz_root,
            joint_order_switched=self.cfg.joint_order_switched)
        return ModelOutput(xyz=xyz, uv=uv, diffusion_loss=diffusion_loss)


class MANO3DHandPose(nn.Module):
    """M6: beta/theta heads -> MANO -> projected uv
    (reference MANO3DHandPose.py)."""

    cfg: Config
    mano: ManoModel = flax.struct.field(pytree_node=False, default=None)

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        feat = ResNetFeatureExtractor(self.cfg.resnet_out_feature_dim,
                                      bn_variance=self.cfg.bn_mode,
                                      pool_grad=self.cfg.pool_grad,
                                      dtype=_dt(self.cfg),
                                      stem=self.cfg.resnet_stem,
                                      name="resnet_extractor")(img, train)
        root_angles, other_angles = MANOThetaPrediction(
            self.cfg.resnet_out_feature_dim, self.cfg.mano_pose_num,
            name="theta_predictor")(feat)
        betas = MANOBetasPrediction(self.cfg.resnet_out_feature_dim,
                                    self.cfg.mano_beta_num,
                                    name="betas_predictor")(feat)
        layer = ManoLayer(model=self.mano, pose_num=self.cfg.mano_pose_num)
        _, joints = layer(root_angles, other_angles, betas)
        uv = batch_project_xyz_to_uv(joints, camera_intrinsic_matrix)
        return ModelOutput(xyz=joints, uv=uv, diffusion_loss=jnp.zeros(()))


class ThreeHandShapeAndPoseMANO(nn.Module):
    """M7: boukhayma-style ResNet_Mano wrapper
    (reference ThreeHandShapeAndPoseMANO.py + resnetMANO.py:138-235)."""

    cfg: Config
    mano: ManoModel = flax.struct.field(pytree_node=False, default=None)

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        pose_num = self.cfg.mano_pose_num
        regress_uv = self.cfg.network_regress_uv
        fc_dim = 10 + pose_num + 3 + (3 if regress_uv else 0)
        xs = ResNetMano(fc_dim=fc_dim, input_channel=self.cfg.input_channels,
                        bn_variance=self.cfg.bn_mode,
                        pool_grad=self.cfg.pool_grad,
                        dtype=_dt(self.cfg), name="resnet_Mano")(img, train)
        rot = xs[:, 0:3]
        theta = xs[:, 3:pose_num + 3]
        beta = xs[:, pose_num + 3:pose_num + 13]
        layer = ManoLayer(model=self.mano, pose_num=pose_num)
        _, joints = layer(rot, theta, beta)
        uv = None
        if regress_uv:
            mean = jnp.asarray([545.0, 128.0, 128.0])
            scale = xs[:, -3] + mean[0]
            trans = xs[:, -2:] + mean[1:]
            uv = trans[:, None, :] + scale[:, None, None] * joints[:, :, :2]
        return ModelOutput(xyz=joints, uv=uv, diffusion_loss=jnp.zeros(()))


class Resnet50MANO3DHandPose(nn.Module):
    """M8: ResNet-50 -> sigmoid MLP -> scaled (rot, theta, beta) -> MANO
    (reference Resnet50MANO3DHandPose.py + resnet50MANO.py:26-63)."""

    cfg: Config
    mano: ManoModel = flax.struct.field(pytree_node=False, default=None)

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        from ..nn.mlp import DecayMLP
        pose_num = self.cfg.mano_pose_num
        fc_dim = 10 + pose_num + 3 + (3 if self.cfg.network_regress_uv else 0)
        feat = ExtendedResNet50(dtype=_dt(self.cfg),
                                bn_variance=self.cfg.bn_mode,
                                pool_grad=self.cfg.pool_grad,
                                stem=self.cfg.resnet_stem,
                                name="extended_resnet50_extractor")(img, train)
        xs = DecayMLP(1000, fc_dim, divide=2, activation="ReLU",
                      use_sigmoid=True, name="mlp")(feat)
        rot = (xs[:, 0:3] - 0.5) * 2 * _PI
        theta = (xs[:, 3:pose_num + 3] - 0.5) * 4
        beta = (xs[:, pose_num + 3:pose_num + 13] - 0.5) * 0.1
        layer = ManoLayer(model=self.mano, pose_num=pose_num)
        _, joints = layer(rot, theta, beta)
        uv = batch_project_xyz_to_uv(joints, camera_intrinsic_matrix)
        return ModelOutput(xyz=joints, uv=uv, theta=theta, beta=beta,
                           diffusion_loss=jnp.zeros(()))


class Hand3DPoseNet(nn.Module):
    """M9: canonical pose + viewpoint MLP heads on ResNet-50 features
    (reference Hand3DPoseNet.py)."""

    cfg: Config
    is_inference: bool = False

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        B = img.shape[0]
        feat = ResNetFeatureExtractor(self.cfg.resnet_out_feature_dim,
                                      bn_variance=self.cfg.bn_mode,
                                      pool_grad=self.cfg.pool_grad,
                                      dtype=_dt(self.cfg),
                                      stem=self.cfg.resnet_stem,
                                      name="resnet_extractor")(img, train)
        can = Pose3dPrediction(self.cfg.resnet_out_feature_dim,
                               self.cfg.keypoint_num,
                               name="pose_predictor")(feat)
        can = can.reshape(B, -1, 3)
        ux, uy, uz = ViewPointPrediction(
            self.cfg.resnet_out_feature_dim,
            name="view_point_predictor")(feat)
        rot_mat = axis_angle_rot_mat(
            jnp.concatenate([ux, uy, uz], axis=-1))
        rel_normed = can @ rot_mat
        if self.is_inference:
            xyz = rel_normed_to_absolute(rel_normed, index_root_bone_length,
                                         keypoint_xyz_root)
            uv = batch_project_xyz_to_uv(xyz, camera_intrinsic_matrix)
            return ModelOutput(xyz=xyz, uv=uv, diffusion_loss=jnp.zeros(()))
        return ModelOutput(coord_xyz_rel_normed=rel_normed, can_xyz=can,
                           rot_mat=rot_mat)


class Hand3DPosePriorNetwork(nn.Module):
    """M10: ZB-style PosePrior + ViewPoint CNNs on scoremap input; the
    reference's current default model (reference Hand3DPosePriorNetwork.py,
    config.py:42)."""

    cfg: Config
    is_inference: bool = False

    @nn.compact
    def __call__(self, img, camera_intrinsic_matrix=None,
                 index_root_bone_length=None, keypoint_xyz_root=None,
                 pose_x0=None, train: bool = False):
        B = img.shape[0]
        can = PosePrior(dtype=_dt(self.cfg), stem=self.cfg.resnet_stem,
                        bn_variance=self.cfg.bn_mode,
                        pool_grad=self.cfg.pool_grad,
                        name="PosePrior_net")(img, train)
        can = can.reshape(B, -1, 3)
        ux, uy, uz = ViewPoint(dtype=_dt(self.cfg),
                               bn_variance=self.cfg.bn_mode,
                               pool_grad=self.cfg.pool_grad,
                               stem=self.cfg.resnet_stem,
                               name="ViewPoint_net")(img, train)
        rot_mat = axis_angle_rot_mat(jnp.concatenate([ux, uy, uz], axis=-1))
        rel_normed = can @ rot_mat
        if self.is_inference:
            xyz = rel_normed_to_absolute(rel_normed, index_root_bone_length,
                                         keypoint_xyz_root)
            uv = batch_project_xyz_to_uv(xyz, camera_intrinsic_matrix)
            return ModelOutput(xyz=xyz, uv=uv)
        return ModelOutput(coord_xyz_rel_normed=rel_normed, can_xyz=can,
                           rot_mat=rot_mat)


_ZOO = {
    "TwoDimHandPose": TwoDimHandPose,
    "TwoDimHandPoseWithFK": TwoDimHandPoseWithFK,
    "ThreeDimHandPose": ThreeDimHandPose,
    "OnlyThreeDimHandPose": OnlyThreeDimHandPose,
    "DiffusionHandPose": DiffusionHandPose,
    "MANO3DHandPose": MANO3DHandPose,
    "ThreeHandShapeAndPoseMANO": ThreeHandShapeAndPoseMANO,
    "Resnet50MANO3DHandPose": Resnet50MANO3DHandPose,
    "Hand3DPoseNet": Hand3DPoseNet,
    "Hand3DPosePriorNetwork": Hand3DPosePriorNetwork,
}

_NEEDS_MANO = {"MANO3DHandPose", "ThreeHandShapeAndPoseMANO",
               "Resnet50MANO3DHandPose"}
_HAS_INFER_FLAG = {"TwoDimHandPoseWithFK", "Hand3DPoseNet",
                   "Hand3DPosePriorNetwork"}


def build_model(cfg: Config, is_inference: bool = False,
                mano: ManoModel | None = None) -> nn.Module:
    """Model registry keyed by ``cfg.model_name``
    (reference trainval.py:76-112)."""
    if cfg.model_name not in _ZOO:
        raise ValueError(f"model_name {cfg.model_name!r} is not supported")
    cls = _ZOO[cfg.model_name]
    kw = {}
    if cfg.model_name in _NEEDS_MANO:
        kw["mano"] = mano if mano is not None else load_mano(
            cfg.mano_right_hand_path or None)
    if cfg.model_name in _HAS_INFER_FLAG:
        kw["is_inference"] = is_inference
    return cls(cfg=cfg, **kw)
