"""Golden parity tests for losses and MPJPE vs the torch reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.losses import (LossCalculation, contrastive_loss,
                                 hand_mask_loss, masked_l2_loss,
                                 regularization_loss)
from handpose_tpu.metrics import masked_sum_count, mpjpe


def test_loss_parity(fixtures):
    f = fixtures("losses")
    crit = LossCalculation(comp_xyz_loss=True, comp_uv_loss=True,
                           comp_hand_mask_loss=True,
                           comp_regularization_loss=True)
    terms = crit(jnp.asarray(f["pre_xyz"]), jnp.asarray(f["gt_xyz"]),
                 jnp.asarray(f["pre_uv"]), jnp.asarray(f["gt_uv"]),
                 jnp.asarray(f["vis"]), hand_mask=jnp.asarray(f["hand_mask"]),
                 theta=jnp.asarray(f["theta"]), beta=jnp.asarray(f["beta"]))
    np.testing.assert_allclose(terms.xyz, f["loss_xyz"], rtol=1e-5)
    np.testing.assert_allclose(terms.uv, f["loss_uv"], rtol=1e-5)
    np.testing.assert_allclose(terms.hand_mask, f["loss_hand_mask"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(terms.regularization, f["loss_reg"], rtol=1e-5)


def test_mpjpe_parity(fixtures):
    f = fixtures("losses")
    m = mpjpe(jnp.asarray(f["pre_xyz"]), jnp.asarray(f["gt_xyz"]),
              jnp.asarray(f["vis"]))
    np.testing.assert_allclose(m, f["mpjpe"], rtol=1e-5)
    # all-invisible guard
    m0 = mpjpe(jnp.asarray(f["pre_xyz"]), jnp.asarray(f["gt_xyz"]),
               jnp.zeros_like(jnp.asarray(f["vis"])))
    np.testing.assert_allclose(m0, f["mpjpe_novis"], atol=1e-7)


def test_masked_sum_count_consistent(fixtures):
    f = fixtures("losses")
    s, n = masked_sum_count(jnp.asarray(f["pre_xyz"]),
                            jnp.asarray(f["gt_xyz"]), jnp.asarray(f["vis"]))
    np.testing.assert_allclose(s / n, f["mpjpe"], rtol=1e-5)


def test_empty_mask_returns_zero():
    a = jnp.ones((2, 21, 3))
    b = jnp.zeros((2, 21, 3))
    vis = jnp.zeros((2, 21, 1))
    assert masked_l2_loss(a, b, vis) == 0.0


def test_contrastive_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(4, 16)).astype(np.float32)
    f2 = rng.normal(size=(4, 16)).astype(np.float32)
    label = rng.integers(0, 2, size=(4,)).astype(np.float32)
    d = F.pairwise_distance(torch.tensor(f1), torch.tensor(f2))
    ref = torch.mean((1 - torch.tensor(label)) * d ** 2 +
                     torch.tensor(label) *
                     torch.clamp(1.0 - d, min=0.0) ** 2).item()
    ours = contrastive_loss(jnp.asarray(f1), jnp.asarray(f2),
                            jnp.asarray(label))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_pck_and_auc(fixtures):
    import jax.numpy as jnp
    from handpose_tpu.metrics import auc_pck, pck

    f = fixtures("losses")
    pred = jnp.asarray(f["pre_xyz"])
    vis = jnp.asarray(f["vis"])
    # identical prediction -> PCK 1 everywhere, AUC 1
    ts = jnp.asarray([0.01, 0.02])
    np.testing.assert_allclose(pck(pred, pred, vis, ts), 1.0)
    np.testing.assert_allclose(auc_pck(pred, pred, vis), 1.0, atol=1e-6)
    # far-off prediction -> 0
    np.testing.assert_allclose(pck(pred + 10.0, pred, vis, ts), 0.0)
    # monotone in threshold
    gt = jnp.asarray(f["gt_xyz"])
    curve = np.asarray(pck(pred, gt, vis, jnp.linspace(0.01, 2.0, 10)))
    assert np.all(np.diff(curve) >= 0)


def test_pck_sum_count_aggregates_to_pck(fixtures):
    """The eval-step aggregable form: summing (correct, n) over batch
    splits and dividing at the end == pck over the concatenation."""
    import jax.numpy as jnp
    from handpose_tpu.metrics import pck, pck_sum_count

    f = fixtures("losses")
    pred = jnp.asarray(f["pre_xyz"])
    gt = jnp.asarray(f["gt_xyz"])
    vis = jnp.asarray(f["vis"])
    ts = jnp.linspace(0.01, 2.0, 7)
    whole = np.asarray(pck(pred, gt, vis, ts))
    h = pred.shape[0] // 2
    c1, n1 = pck_sum_count(pred[:h], gt[:h], vis[:h], ts)
    c2, n2 = pck_sum_count(pred[h:], gt[h:], vis[h:], ts)
    agg = (np.asarray(c1) + np.asarray(c2)) / (float(n1) + float(n2))
    np.testing.assert_allclose(agg, whole, rtol=1e-6)


def test_plot_3d_keypoints(tmp_path, fixtures):
    from handpose_tpu.utils.vis import load_skeleton, plot_3d_keypoints

    f = fixtures("losses")
    out = tmp_path / "kp3d.png"
    plot_3d_keypoints(f["pre_xyz"][0], str(out), f["vis"][0])
    assert out.exists() and out.stat().st_size > 0

    sk_path = tmp_path / "skeleton.txt"
    sk_path.write_text("# c\n" + "".join(f"j{j} {j} {j-1}\n"
                                         for j in range(5)))
    sk = load_skeleton(str(sk_path), 5)
    assert sk[0]["child_id"] == [1]
    assert sk[3]["parent_id"] == 2


def test_loss_gating_aggregation(fixtures):
    """compute_losses must reproduce the reference's per-model gated sum
    incl. the uv/1e5 scaling (reference trainval.py:330-360)."""
    import jax.numpy as jnp
    from handpose_tpu.config import Config
    from handpose_tpu.models.zoo import ModelOutput
    from handpose_tpu.train.steps import compute_losses
    from handpose_tpu.losses import (hand_mask_loss, masked_l2_loss,
                                     regularization_loss)

    f = fixtures("losses")
    batch = {
        "keypoint_xyz21": jnp.asarray(f["gt_xyz"]),
        "keypoint_uv21": jnp.asarray(f["gt_uv"]),
        "keypoint_vis21": jnp.asarray(f["vis"]),
        "right_hand_mask": jnp.asarray(f["hand_mask"]),
        "kp_coord_xyz21_rel_can": jnp.asarray(f["gt_xyz"]),
        "rot_mat": jnp.eye(3)[None].repeat(4, 0),
    }
    out = ModelOutput(xyz=jnp.asarray(f["pre_xyz"]),
                      uv=jnp.asarray(f["pre_uv"]),
                      diffusion_loss=jnp.asarray(0.25),
                      theta=jnp.asarray(f["theta"]),
                      beta=jnp.asarray(f["beta"]))
    vis = batch["keypoint_vis21"]
    l_xyz = masked_l2_loss(out.xyz, batch["keypoint_xyz21"], vis)
    l_uv = masked_l2_loss(out.uv, batch["keypoint_uv21"], vis)
    l_hm = hand_mask_loss(out.uv, batch["keypoint_uv21"],
                          batch["right_hand_mask"])
    l_reg = regularization_loss(out.theta, out.beta)

    cases = {
        "TwoDimHandPose": l_uv / 1e5,
        "TwoDimHandPoseWithFK": l_xyz + l_uv / 1e5,
        "ThreeDimHandPose": l_xyz,
        "OnlyThreeDimHandPose": l_xyz,
        "DiffusionHandPose": l_xyz + 0.25,
        "MANO3DHandPose": l_xyz,
        "ThreeHandShapeAndPoseMANO": l_xyz,
        "Resnet50MANO3DHandPose": l_xyz + l_hm + l_reg,
    }
    for name, expected in cases.items():
        cfg = Config(model_name=name)
        got = compute_losses(out, batch, cfg)["loss"]
        np.testing.assert_allclose(float(got), float(expected), rtol=1e-6,
                                   err_msg=name)


def test_save_scoremap_grid(tmp_path, fixtures):
    from handpose_tpu.utils.vis import save_scoremap_grid

    f = fixtures("scoremap")
    out = tmp_path / "grid.png"
    save_scoremap_grid(f["maps"][0], str(out))
    assert out.exists() and out.stat().st_size > 0


def test_hand_mask_loss_non_square_mask():
    """v (row) must clamp by H and u (col) by W; the reference clamps
    both by shape[-1], which is only right for square masks.

    H > W makes the case discriminating: a both-axes-by-W clamp lands
    v=6 on row W-1=3 (an IN-RANGE wrong row, not rescued by jnp's gather
    clipping), reading a cold cell -> loss 1.0 instead of 0.0."""
    H, W = 8, 4
    mask = np.zeros((1, H, W), np.float32)
    mask[0, 6, 2] = 1.0        # only hot cell: row 6 (v), col 2 (u)
    uv_hot = jnp.asarray([[[2.0, 6.0]]])        # lands exactly on it
    l_hot = float(hand_mask_loss(uv_hot, uv_hot, jnp.asarray(mask)))
    assert l_hot == pytest.approx(0.0, abs=1e-6)
    # v beyond H clamps to H-1=7; row 7 is cold on both gt and pred so
    # the loss guard yields 1.0 (sanity that clamping is by H, not W)
    uv_far = jnp.asarray([[[2.0, 100.0]]])
    l_far = float(hand_mask_loss(uv_far, uv_far, jnp.asarray(mask)))
    assert l_far == pytest.approx(1.0, abs=1e-6)
