"""Twin-training convergence parity vs the executed torch reference.

The BASELINE.md north star -- "MPJPE within 1% of the PyTorch reference"
-- proven EMPIRICALLY: both frameworks train from the same transferred
init on the same batches for >=100 Adam steps with the reference recipe,
and their validation-MPJPE trajectories must agree within 1% at every
epoch (tools/twin_train_parity.py; reference trainval.py:234-396,
trainval_hand3DPose.py:230-320, criterions/metrics.py:6-27).

Covers one FK-family model and the BN-heavy trainer-B flagship (two
ResNet-18 trunks' worth of BatchNorm running-stat evolution -- the hard
case for long-horizon divergence).
"""

import os
import sys

import pytest

pytest.importorskip("torch")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir("/root/reference"),
                       reason="reference repo not mounted"),
]

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _run(model, **kw):
    from twin_train_parity import run_twin

    return run_twin(model, **kw)


def _check(res):
    assert res["steps"] >= 100
    assert res["max_epoch_val_rel_diff"] <= 0.01, (
        res["torch_val_mpjpe"], res["jax_val_mpjpe"])
    assert res["mean_loss_rel_diff"] <= 0.08, res["mean_loss_rel_diff"]


def test_twin_training_convergence_fk():
    """FK family (ThreeDimHandPose): backbone + bone heads + FK layer."""
    _check(_run("ThreeDimHandPose", n_train=200, n_val=48, batch_size=4,
                epochs=2, crop=64, feat_dim=128, seed=0))


def test_twin_training_convergence_flagship():
    """Trainer-B flagship (Hand3DPosePriorNetwork): BN-heavy twin
    ResNet-18 backbones, canonical + viewpoint loss."""
    _check(_run("Hand3DPosePriorNetwork", n_train=200, n_val=48,
                batch_size=4, epochs=2, crop=64, seed=0))


def test_twin_training_convergence_diffusion():
    """Diffusion family (DiffusionHandPose): per-step in-forward DDIM
    sampling + denoiser objective.  The stochastic draws (x_T, t, noise)
    are captured from the torch reference by seed replay and injected
    into the JAX step (the ``_inject_*`` batch surface), making the twin
    run lockstep despite the sampler; T=20/10 as in the transfer-parity
    test."""
    _check(_run("DiffusionHandPose", n_train=200, n_val=48, batch_size=4,
                epochs=2, crop=64, feat_dim=128, seed=0))


def test_twin_training_convergence_mano():
    """MANO family (MANO3DHandPose): theta/beta heads through
    Rodrigues + LBS."""
    if not os.path.exists("/root/reference/config/mano/models/"
                          "MANO_RIGHT.pkl"):
        pytest.skip("MANO asset not available")
    _check(_run("MANO3DHandPose", n_train=200, n_val=48, batch_size=4,
                epochs=2, crop=64, feat_dim=128, seed=0))


def test_twin_training_convergence_mask_loss():
    """Resnet50MANO family (M8): the only hand-mask + theta/beta
    regularization loss path (reference trainval.py:106-110) -- its
    integer-gather mask sampling and norm regularizer were previously
    pinned only statically."""
    if not os.path.exists("/root/reference/config/mano/models/"
                          "MANO_RIGHT.pkl"):
        pytest.skip("MANO asset not available")
    _check(_run("Resnet50MANO3DHandPose", n_train=200, n_val=48,
                batch_size=4, epochs=2, crop=64, seed=0))
