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


def test_flagship_grad_parity():
    """Trainer-B training numerics on the flagship (reference
    Hand3DPosePriorNetwork.py + loss trainval_hand3DPose.py:284-288):
    gradient tree through twin ResNet-18 backbones, MLP heads, axis-angle
    rotation assembly, masked xyz L2 + rot-matrix MSE."""
    _ref_config(input_channels=21, keypoint_num=21, is_inference=False,
                joint_order_switched=True)
    from network.Hand3DPosePriorNetwork import (
        Hand3DPosePriorNetwork as TorchM10)

    torch.manual_seed(12)
    tm = TorchM10(device="cpu").eval()
    _randomize_bn(tm)

    cfg = Config(model_name="Hand3DPosePriorNetwork", input_channels=21,
                 compute_dtype="float32", joint_order_switched=True)
    model = build_model(cfg)
    rng = np.random.default_rng(12)
    B, S = 2, 64
    img = rng.uniform(0, 1, (B, S, S, 21)).astype(np.float32)
    K = np.tile(np.asarray([[320., 0., S / 2], [0., 320., S / 2],
                            [0., 0., 1.]], np.float32), (B, 1, 1))
    scale = np.full((B, 1), 0.8, np.float32)
    root = np.asarray([[0, 0, 0.6]] * B, np.float32)
    rel_gt = rng.normal(scale=0.3, size=(B, 21, 3)).astype(np.float32)
    q = np.linalg.qr(rng.normal(size=(B, 3, 3)))[0].astype(np.float32)
    _, _, vis = _gt(12)

    def head_params(tnet):
        sd = {k: v.numpy() for k, v in
              tnet.extended_resnet18_extractor.feature_extractor
              .state_dict().items()}
        p, s = convert_state_dict(sd, [2, 2, 2, 2], block="basic",
                                  skip_stem=False)
        return ({"backbone": {"trunk": p}, "mlp": _seq_to_mlp(tnet.mlp)},
                {"backbone": {"trunk": s}})

    def head_grads(tnet):
        fe = tnet.extended_resnet18_extractor.feature_extractor
        sd = {k: (p.grad if p.grad is not None
                  else torch.zeros_like(p)).numpy()
              for k, p in fe.named_parameters()}
        for k, v in fe.state_dict().items():
            if "running" in k:
                sd[k] = np.zeros_like(v.numpy())
        g, _ = convert_state_dict(sd, [2, 2, 2, 2], block="basic",
                                  skip_stem=False)
        return {"backbone": {"trunk": g}, "mlp": _grad_mlp(tnet.mlp)}

    pp_p, pp_s = head_params(tm.PosePrior_net)
    vp_p, vp_s = head_params(tm.ViewPoint_net)
    params = {"PosePrior_net": pp_p, "ViewPoint_net": vp_p}
    stats = {"PosePrior_net": pp_s, "ViewPoint_net": vp_s}

    tm.zero_grad()
    (t_rel, _, t_rot), _, _ = tm(torch.tensor(img.transpose(0, 3, 1, 2)),
                                 torch.tensor(K), torch.tensor(scale),
                                 torch.tensor(root))
    tloss = (_torch_masked_l2(t_rel, torch.tensor(rel_gt), vis) +
             torch.nn.functional.mse_loss(t_rot, torch.tensor(q)))
    tloss.backward()
    tgrads = {"PosePrior_net": head_grads(tm.PosePrior_net),
              "ViewPoint_net": head_grads(tm.ViewPoint_net)}

    from handpose_tpu.losses import rot_mat_mse
    jvis = jnp.asarray(vis)

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": stats},
                          jnp.asarray(img), jnp.asarray(K),
                          jnp.asarray(scale), jnp.asarray(root), train=False)
        return (masked_l2_loss(out.coord_xyz_rel_normed,
                               jnp.asarray(rel_gt), jvis) +
                rot_mat_mse(out.rot_mat, jnp.asarray(q)))

    jloss, jgrads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(float(jloss), float(tloss.detach()),
                               rtol=1e-5, atol=1e-6)
    _assert_tree_close(jgrads, tgrads, rtol=2e-3, atol=2e-5)


def test_unet1d_grad_parity():
    """Diffusion-denoiser training backward: d(MSE)/d(params) for the full
    Unet1D (conv1d blocks, linear+full attention, RMS norms, time+condition
    embeddings) matches torch autograd -- no RNG involved, so this pins the
    p_losses backward path (reference conditionalDiffusion.py:733-798)."""
    from network.sub_modules.conditionalDiffusion import Unet1D as TorchUnet
    from test_diffusion_parity import build_unet_params
    from handpose_tpu.nn.diffusion import Unet1D

    torch.manual_seed(13)
    dim, cond_dim = 32, 48
    tnet = TorchUnet(dim=dim, dim_mults=(1, 2, 4, 8), channels=1,
                     condition_feat_dim=cond_dim).eval()
    fnet = Unet1D(dim=dim, dim_mults=(1, 2, 4, 8), channels=1,
                  condition_feat_dim=cond_dim)
    params = build_unet_params(tnet)

    rng = np.random.default_rng(13)
    x = rng.normal(size=(2, 1, 63)).astype(np.float32)
    t = np.array([3, 15], np.int64)
    cond = rng.normal(size=(2, cond_dim)).astype(np.float32)
    target = rng.normal(size=(2, 1, 63)).astype(np.float32)

    tnet.zero_grad()
    tout = tnet(torch.tensor(x), torch.tensor(t),
                condition=torch.tensor(cond))
    tloss = torch.nn.functional.mse_loss(tout, torch.tensor(target))
    tloss.backward()

    def loss_fn(p):
        out = fnet.apply({"params": p}, jnp.asarray(x.transpose(0, 2, 1)),
                         jnp.asarray(t), jnp.asarray(cond))
        return jnp.mean((jnp.swapaxes(out, 1, 2)
                         - jnp.asarray(target)) ** 2)

    jloss, jgrads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    # f32 accumulation-order noise through the deep UNet puts the loss
    # just past 1e-5 relative; 5e-5 still pins the numerics.
    np.testing.assert_allclose(float(jloss), float(tloss.detach()),
                               rtol=5e-5, atol=1e-6)

    # compare grads on a representative subset spanning every block type
    checks = [
        (("init_conv", "kernel"),
         lambda: tnet.init_conv.weight.grad.numpy().transpose(2, 1, 0)),
        (("time_mlp_1", "kernel"),
         lambda: tnet.time_mlp[1].weight.grad.numpy().T),
        (("cond_mlp_2", "kernel"),
         lambda: tnet.condition_feat_mlp[2].weight.grad.numpy().T),
        (("down_0_block1", "block1", "proj", "kernel"),
         lambda: tnet.downs[0][0].block1.proj.weight.grad
         .numpy().transpose(2, 1, 0)),
        (("mid_attn", "attn", "to_qkv", "kernel"),
         lambda: tnet.mid_attn.fn.fn.to_qkv.weight.grad
         .numpy().transpose(2, 1, 0)),
        (("up_2_attn", "attn", "to_out", "kernel"),
         lambda: tnet.ups[2][2].fn.fn.to_out[0].weight.grad
         .numpy().transpose(2, 1, 0)),
        (("final_conv", "kernel"),
         lambda: tnet.final_conv.weight.grad.numpy().transpose(2, 1, 0)),
    ]
    for path, tgrad in checks:
        leaf = jgrads
        for k in path:
            leaf = leaf[k]
        np.testing.assert_allclose(np.asarray(leaf), tgrad(),
                                   rtol=2e-3, atol=2e-5,
                                   err_msg="/".join(path))


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
