"""Model zoo (M1-M10) and registry."""

from .zoo import (ModelOutput, TwoDimHandPose, TwoDimHandPoseWithFK,
                  ThreeDimHandPose, OnlyThreeDimHandPose, DiffusionHandPose,
                  MANO3DHandPose, ThreeHandShapeAndPoseMANO,
                  Resnet50MANO3DHandPose, Hand3DPoseNet,
                  Hand3DPosePriorNetwork, build_model)

__all__ = [
    "ModelOutput", "TwoDimHandPose", "TwoDimHandPoseWithFK",
    "ThreeDimHandPose", "OnlyThreeDimHandPose", "DiffusionHandPose",
    "MANO3DHandPose", "ThreeHandShapeAndPoseMANO", "Resnet50MANO3DHandPose",
    "Hand3DPoseNet", "Hand3DPosePriorNetwork", "build_model",
]
