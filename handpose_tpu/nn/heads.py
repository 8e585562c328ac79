"""Prediction heads (bone angles/lengths, pose/viewpoint, MANO params).

TPU-native ports of:
* BoneAnglePrediction / BoneLengthPrediction -- reference
  network/sub_modules/bonePrediction.py:49-108.
* Pose3dPrediction / ViewPointPrediction    -- reference
  network/sub_modules/PoseViewPointMLP.py:15-56.
* PosePrior / ViewPoint CNN heads           -- reference
  network/sub_modules/PoseViewPointNetwork.py:35-93.
* MANOBetasPrediction / MANOThetaPrediction -- reference
  network/sub_modules/MANOLayer.py:246-281.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from .mlp import DecayMLP
from .resnet import ExtendedResNet18

_PI = math.pi


class BoneAnglePrediction(nn.Module):
    """(B, D) features -> (root_angles (B, 3), other_angles (B, 23))."""

    input_dim: int = 63
    other_angles_num: int = 23

    @nn.compact
    def __call__(self, x):
        root = DecayMLP(self.input_dim, 3, divide=2, activation="LeakyReLU",
                        use_sigmoid=False, name="mlp1")(x)
        other = DecayMLP(self.input_dim, self.other_angles_num, divide=2,
                         activation="LeakyReLU", use_sigmoid=False,
                         name="mlp2")(x)
        return root, other


class BoneLengthPrediction(nn.Module):
    """(B, D) features -> (B, 20) bone lengths."""

    input_dim: int = 63
    bone_length_num: int = 20

    @nn.compact
    def __call__(self, x):
        return DecayMLP(self.input_dim, self.bone_length_num, divide=2,
                        activation="LeakyReLU", use_sigmoid=False,
                        name="mlp1")(x)


class Pose3dPrediction(nn.Module):
    """(B, D) -> (B, 63) canonical pose scaled to (-2, 2)."""

    input_dim: int
    keypoint_num: int = 21

    @nn.compact
    def __call__(self, x):
        kps = DecayMLP(self.input_dim, self.keypoint_num * 3, divide=4,
                       use_sigmoid=True, name="mlp")(x)
        return (kps - 0.5) * 4.0


class ViewPointPrediction(nn.Module):
    """(B, D) -> (ux, uy, uz) each (B, 1), via a 64-d angle bottleneck."""

    input_dim: int

    @nn.compact
    def __call__(self, x):
        angles = DecayMLP(self.input_dim, 64, divide=4, use_sigmoid=True,
                          name="mlp")(x)
        angles = (angles - 0.5) * 2.0 * _PI
        ux = nn.Dense(1, name="fc_vp_ux")(angles)
        uy = nn.Dense(1, name="fc_vp_uy")(angles)
        uz = nn.Dense(1, name="fc_vp_uz")(angles)
        return ux, uy, uz


class PosePrior(nn.Module):
    """Scoremap stack -> 63-d canonical pose (ResNet-18 backbone).

    Reference PoseViewPointNetwork.py:35-60.
    """

    dtype: jnp.dtype = jnp.float32
    stem: str = "k3s2"
    bn_variance: str = "stable"
    pool_grad: str = "native"   # see ops/pooling.py (mirrors Config.pool_grad)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ExtendedResNet18(dtype=self.dtype, stem=self.stem,
                                bn_variance=self.bn_variance,
                                pool_grad=self.pool_grad,
                                name="backbone")(x, train)
        return DecayMLP(1000, 63, divide=2, activation="LeakyReLU",
                        use_sigmoid=False, name="mlp")(feat)


class ViewPoint(nn.Module):
    """Scoremap stack -> (ux, uy, uz) axis-angle components.

    Reference PoseViewPointNetwork.py:64-93.
    """

    dtype: jnp.dtype = jnp.float32
    stem: str = "k3s2"
    bn_variance: str = "stable"
    pool_grad: str = "native"   # see ops/pooling.py (mirrors Config.pool_grad)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ExtendedResNet18(dtype=self.dtype, stem=self.stem,
                                bn_variance=self.bn_variance,
                                pool_grad=self.pool_grad,
                                name="backbone")(x, train)
        out = DecayMLP(1000, 3, divide=4, activation="LeakyReLU",
                       use_sigmoid=False, name="mlp")(feat)
        return out[:, 0:1], out[:, 1:2], out[:, 2:3]


class MANOBetasPrediction(nn.Module):
    """(B, D) -> (B, 10) shape coefficients centred at 0."""

    input_dim: int
    beta_num: int = 10

    @nn.compact
    def __call__(self, x):
        betas = DecayMLP(self.input_dim, self.beta_num, divide=4,
                         use_sigmoid=True, name="mlp")(x)
        return betas - 0.5


class MANOThetaPrediction(nn.Module):
    """(B, D) -> (root_angles (B, 3) in ±pi, other (B, pose_num) in ±pi/2)."""

    input_dim: int
    pose_num: int = 10

    @nn.compact
    def __call__(self, x):
        root = DecayMLP(self.input_dim, 3, divide=4, use_sigmoid=True,
                        name="mlp1")(x)
        root = (root - 0.5) * 2.0 * _PI
        other = DecayMLP(self.input_dim, self.pose_num, divide=2,
                         use_sigmoid=True, name="mlp2")(x)
        other = (other - 0.5) * _PI
        return root, other
