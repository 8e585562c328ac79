"""handpose_tpu -- TPU-native 3D hand-pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hongrui16/3DHandPoseEstimation (see SURVEY.md): RHD / InterHand2.6M data
pipelines with device-side geometric preprocessing, a ten-model zoo sharing
one forward contract (2D/3D regression, differentiable forward kinematics,
MANO mesh, PosePrior/viewpoint decomposition, conditional 1-D diffusion),
visibility-masked losses + MPJPE, and jit/pjit training & inference
harnesses that scale over a device mesh.
"""

__version__ = "0.1.0"

from .config import (Config, DEFAULT_CONFIG, MODEL_NAMES, LOSS_GATES,
                     apply_overrides)

__all__ = ["Config", "DEFAULT_CONFIG", "MODEL_NAMES", "LOSS_GATES",
           "apply_overrides"]
