"""Neural building blocks: backbones, heads, FK, MANO, diffusion."""

from .mlp import DecayMLP, decay_dims
from .resnet import (ResNet, ResNet18, ResNet34, ResNet50,
                     ResNetFeatureExtractor, ExtendedResNet18,
                     ExtendedResNet50, ResNetMano)
from .heads import (BoneAnglePrediction, BoneLengthPrediction,
                    Pose3dPrediction, ViewPointPrediction, PosePrior,
                    ViewPoint, MANOBetasPrediction, MANOThetaPrediction)
from .fk import forward_kinematics, fk_positions, JOINT_SWITCH_PERM
from .mano import ManoLayer, ManoModel, load_mano, synthetic_mano, find_mano_pkl

__all__ = [
    "DecayMLP", "decay_dims",
    "ResNet", "ResNet18", "ResNet34", "ResNet50", "ResNetFeatureExtractor",
    "ExtendedResNet18", "ExtendedResNet50", "ResNetMano",
    "BoneAnglePrediction", "BoneLengthPrediction", "Pose3dPrediction",
    "ViewPointPrediction", "PosePrior", "ViewPoint", "MANOBetasPrediction",
    "MANOThetaPrediction",
    "forward_kinematics", "fk_positions", "JOINT_SWITCH_PERM",
    "ManoLayer", "ManoModel", "load_mano", "synthetic_mano", "find_mano_pkl",
]
