"""Gradient and optimizer-trajectory parity vs the executed torch reference.

Forward weight-transfer parity (test_model_transfer_parity.py) pins the
inference numerics; these tests pin the TRAINING numerics: with identical
weights, batch, and visibility-masked loss, the full parameter-gradient
tree must match the reference's autograd (through the ResNet trunk, the
MLP heads, and the FK / MANO composition), and a 2-step Adam trajectory
must reproduce the same losses.  This is the strongest trainability
evidence obtainable with zero egress: it would catch wrong custom-vjp
behavior, masked-loss denominator drift, stop-gradient mistakes, and
optimizer wiring differences (reference trainval.py:119-121,330-362).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

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
from handpose_tpu.losses import masked_l2_loss  # noqa: E402
from handpose_tpu.models import build_model  # noqa: E402

from test_model_transfer_parity import (  # noqa: E402
    FEAT_DIM, _extractor_params, _inputs, _lin, _randomize_bn, _ref_config,
    _seq_to_mlp)


def _grad_lin(m):
    return {"kernel": np.asarray(m.weight.grad.numpy().T),
            "bias": np.asarray(m.bias.grad.numpy())}


def _grad_mlp(tseq):
    linears = [m for m in tseq if isinstance(m, torch.nn.Linear)]
    return {f"Dense_{i}": _grad_lin(m) for i, m in enumerate(linears)}


def _grad_extractor(textractor):
    """Gradient tree of the reference ResNetFeatureExtractor, laid out like
    the flax params tree (reusing the weight converter on a grads dict)."""
    fe = textractor.feature_extractor
    sd = {}
    for k, p in fe.named_parameters():
        sd[k] = (p.grad if p.grad is not None
                 else torch.zeros_like(p)).numpy()
    # the converter also indexes running stats; feed zeros (stats have no
    # grads) and drop its batch_stats output
    for k, v in fe.state_dict().items():
        if "running" in k:
            sd[k] = np.zeros_like(v.numpy())
    g, _ = convert_state_dict(sd, [3, 4, 6, 3], block="bottleneck",
                              skip_stem=False)
    return {"trunk": g, "fc_proj": _grad_lin(textractor.fc)}


def _gt(seed, B=2):
    rng = np.random.default_rng(seed)
    xyz_gt = rng.normal(scale=0.3, size=(B, 21, 3)).astype(np.float32)
    uv_gt = rng.uniform(5, 59, (B, 21, 2)).astype(np.float32)
    vis = (rng.uniform(size=(B, 21, 1)) > 0.3)          # mixed mask
    vis[:, 0] = True                                     # roots visible
    return xyz_gt, uv_gt, vis


def _torch_masked_l2(pred, gt, vis):
    sq = ((pred - gt) ** 2).sum(dim=2)
    v = torch.tensor(vis.reshape(sq.shape), dtype=sq.dtype)
    n = v.sum()
    return (sq * v).sum() / n


def _assert_tree_close(ours, theirs, rtol, atol, path=""):
    if isinstance(theirs, dict):
        assert set(ours.keys()) == set(theirs.keys()), path
        for k in theirs:
            _assert_tree_close(ours[k], theirs[k], rtol, atol, f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                                   rtol=rtol, atol=atol, err_msg=path)


def test_threedimhandpose_grad_and_adam_parity():
    """FK-family training numerics: full gradient tree + 2 Adam steps
    (reference ThreeDimHandPose.py, loss gating trainval.py:330-346)."""
    _ref_config(input_channels=3, keypoint_num=21,
                resnet_out_feature_dim=FEAT_DIM, joint_order_switched=True,
                other_joint_angles_num=23, bone_length_num=20)
    from network.ThreeDimHandPose import ThreeDimHandPose as TorchM3

    torch.manual_seed(10)
    tm = TorchM3(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="ThreeDimHandPose", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, compute_dtype="float32",
                 joint_order_switched=True)
    model = build_model(cfg)
    img, K, scale, root = _inputs(seed=10)
    xyz_gt, uv_gt, vis = _gt(10)

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

    timg = torch.tensor(img.transpose(0, 3, 1, 2))
    tK, tscale, troot = (torch.tensor(K), torch.tensor(scale),
                         torch.tensor(root))
    txyz_gt, tuv_gt = torch.tensor(xyz_gt), torch.tensor(uv_gt)

    def torch_loss():
        (xyz, uv, _), _, _ = tm(timg, tK, tscale, troot)
        return (_torch_masked_l2(xyz, txyz_gt, vis) +
                _torch_masked_l2(uv, tuv_gt, vis) / 1e5)

    tm.zero_grad()
    tloss = torch_loss()
    tloss.backward()

    tgrads = {
        "resnet_extractor": _grad_extractor(tm.resnet_extractor),
        "threeDimPoseEstimate": _grad_mlp(tm.threeDimPoseEstimate),
        "bone_angle_pred_model": {
            "mlp1": _grad_mlp(tm.bone_angle_pred_model.mlp1),
            "mlp2": _grad_mlp(tm.bone_angle_pred_model.mlp2)},
        "bone_length_pred_model": {
            "mlp1": _grad_mlp(tm.bone_length_pred_model.mlp1)},
    }

    jvis = jnp.asarray(vis)

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": stats},
                          jnp.asarray(img), jnp.asarray(K),
                          jnp.asarray(scale), jnp.asarray(root), train=False)
        return (masked_l2_loss(out.xyz, jnp.asarray(xyz_gt), jvis) +
                masked_l2_loss(out.uv, jnp.asarray(uv_gt), jvis) / 1e5)

    jloss, jgrads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(float(jloss), float(tloss.detach()),
                               rtol=1e-5, atol=1e-6)
    _assert_tree_close(jgrads, tgrads, rtol=2e-3, atol=2e-5)

    # -- 3-point Adam trajectory (reference trainval.py:119, Adam lr=1e-4) --
    # NB: _lin / bn leaves are numpy VIEWS of torch storage, and torch's
    # in-place Adam step would mutate them under a zero-copy jnp.asarray;
    # deep-copy when seeding the optax side.
    topt = torch.optim.Adam(tm.parameters(), lr=1e-4)
    jopt = optax.adam(1e-4)
    jparams = jax.tree.map(lambda a: jnp.asarray(np.array(a, copy=True)),
                           params)
    jstate = jopt.init(jparams)
    tlosses, jlosses = [], []
    for _ in range(3):
        jl, jg = jax.value_and_grad(loss_fn)(jparams)
        jlosses.append(float(jl))
        upd, jstate = jopt.update(jg, jstate, jparams)
        jparams = optax.apply_updates(jparams, upd)

        tm.zero_grad()
        tl = torch_loss()
        tlosses.append(float(tl.detach()))
        tl.backward()
        topt.step()
    # losses before 0, 1, and 2 optimizer updates must coincide
    np.testing.assert_allclose(jlosses, tlosses, rtol=1e-4, atol=1e-6)
    assert jlosses[-1] < jlosses[0]          # optimization makes progress


def test_mano3dhandpose_grad_parity():
    """MANO-family training numerics: full gradient tree through theta/beta
    heads + Rodrigues + LBS (reference MANO3DHandPose.py)."""
    mano_pkl = os.path.join(REF, "config", "mano", "models",
                            "MANO_RIGHT.pkl")
    if not os.path.exists(mano_pkl):
        pytest.skip("MANO asset not available")
    _ref_config(input_channels=3, keypoint_num=21,
                resnet_out_feature_dim=FEAT_DIM, joint_order_switched=True,
                mano_pose_num=10, mano_beta_num=10,
                mano_right_hand_path=mano_pkl)
    from network.MANO3DHandPose import MANO3DHandPose as TorchM6

    torch.manual_seed(11)
    tm = TorchM6(device="cpu", mano_right_hand_path=mano_pkl).eval()
    _randomize_bn(tm)

    from handpose_tpu.nn.mano import load_mano
    cfg = Config(model_name="MANO3DHandPose", input_channels=3,
                 resnet_out_feature_dim=FEAT_DIM, compute_dtype="float32",
                 mano_pose_num=10, joint_order_switched=True)
    model = build_model(cfg, mano=load_mano(mano_pkl))
    img, K, scale, root = _inputs(seed=11)
    xyz_gt, uv_gt, vis = _gt(11)

    ext_p, ext_s = _extractor_params(tm.resnet_extractor)
    params = {
        "resnet_extractor": ext_p,
        "theta_predictor": {"mlp1": _seq_to_mlp(tm.theta_predictor.mlp1),
                            "mlp2": _seq_to_mlp(tm.theta_predictor.mlp2)},
        "betas_predictor": {"mlp": _seq_to_mlp(tm.betas_predictor.mlp)},
    }
    stats = {"resnet_extractor": ext_s}

    tm.zero_grad()
    (xyz, uv, _), _, _ = tm(torch.tensor(img.transpose(0, 3, 1, 2)),
                            torch.tensor(K), torch.tensor(scale),
                            torch.tensor(root))
    tloss = (_torch_masked_l2(xyz, torch.tensor(xyz_gt), vis) +
             _torch_masked_l2(uv, torch.tensor(uv_gt), vis) / 1e5)
    tloss.backward()
    tgrads = {
        "resnet_extractor": _grad_extractor(tm.resnet_extractor),
        "theta_predictor": {"mlp1": _grad_mlp(tm.theta_predictor.mlp1),
                            "mlp2": _grad_mlp(tm.theta_predictor.mlp2)},
        "betas_predictor": {"mlp": _grad_mlp(tm.betas_predictor.mlp)},
    }

    jvis = jnp.asarray(vis)

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": stats},
                          jnp.asarray(img), jnp.asarray(K),
                          jnp.asarray(scale), jnp.asarray(root), train=False)
        return (masked_l2_loss(out.xyz, jnp.asarray(xyz_gt), jvis) +
                masked_l2_loss(out.uv, jnp.asarray(uv_gt), jvis) / 1e5)

    jloss, jgrads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(float(jloss), float(tloss.detach()),
                               rtol=1e-5, atol=1e-6)
    _assert_tree_close(jgrads, tgrads, rtol=2e-3, atol=2e-5)
