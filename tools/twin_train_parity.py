#!/usr/bin/env python
"""Twin-training convergence parity: torch reference vs handpose_tpu.

The last unproven BASELINE.md claim is EMPIRICAL convergence parity
("MPJPE within 1% of the PyTorch reference").  Static weight-transfer
forward parity and short Adam-trajectory parity pin the per-step numerics;
this harness pins the *training dynamics*: it trains the executed torch
reference model (reference trainval.py:234-396 / trainval_hand3DPose.py:
230-320) and the Flax model FROM THE SAME transferred initialisation on
THE SAME synthetic-RHD batches in THE SAME order with the same recipe
(Adam lr=1e-4 + per-epoch CosineAnnealingLR eta_min=1e-5, reference
trainval.py:119-121), for >=2 epochs / >=100 Adam steps, and compares the
loss curve and per-epoch validation MPJPE.

The torch side uses the reference's OWN criterion and aggregation
(criterions/loss.py::LossCalculation, criterions/metrics.py MPJPE
definition with exact sum/count epoch aggregation); the JAX side runs the
production ``make_train_step`` / ``make_eval_step`` programs.  Both sides
consume identical numpy batches produced once by the (parity-tested)
device preprocessing, so any divergence isolates the training loop:
forward/backward numerics, Adam, the LR schedule, and BatchNorm
running-stat evolution (the BN-heavy flagship is the hard case).

Usage:
  python tools/twin_train_parity.py --model ThreeDimHandPose \
      --epochs 4 --n-train 200 --batch-size 8
  python tools/twin_train_parity.py --model Hand3DPosePriorNetwork
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests"),
          os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)

REF = os.environ.get("HANDPOSE_REFERENCE", "/root/reference")


def deep_copy_tree(tree):
    """Deep-copy a transferred tree into fresh jnp buffers.

    The transfer helpers (tests/test_model_transfer_parity.py) return
    ``tensor.numpy()`` VIEWS of torch storage, and contiguous 1-D leaves
    (biases, BN scales/means) zero-copy through ``jnp.asarray`` on the
    CPU backend -- without this copy, any later torch-side mutation
    (``opt.step()``, a moments-into-params reload) silently mutates the
    JAX tree too.  Shared by this harness and
    tools/convert_reference_checkpoint.py."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.array(np.array(x)), tree)


def make_epoch_batches(ds, indices_per_epoch, crop, sigma):
    """Preprocess fixed per-epoch batch index lists into numpy sample
    dicts with the jitted (parity-tested) pipeline -- the single data
    source both frameworks consume."""
    import jax

    from handpose_tpu.data.preprocess import preprocess_batch

    out = []
    for chunks in indices_per_epoch:
        ep = []
        for chunk in chunks:
            raw = ds.raw_batch(list(chunk))
            sample = preprocess_batch(jax.device_put(raw), crop_size=crop,
                                      sigma=sigma, switch_joint_order=True)
            ep.append({k: np.asarray(v) for k, v in sample.items()})
        out.append(ep)
    return out


def build_pair(model_name: str, feat_dim: int,
               diff_T: int = 20, diff_sampling: int = 10,
               cond_dim: int = 64):
    """Construct the torch reference model and the Flax model with the
    torch init transferred (tests/test_model_transfer_parity.py
    machinery; float32 compute both sides).  ``diff_T``/``diff_sampling``/
    ``cond_dim`` size the DiffusionHandPose schedules and conditioning
    width: the twin tests keep them small (20/10/64) so the in-forward
    DDIM loop stays affordable on CPU; the checkpoint converter passes
    the reference production defaults (400/200/256, reference
    config.py:56-58) so a real checkpoint's buffers shape-match."""
    import torch

    import test_model_transfer_parity as xfer
    from handpose_tpu.config import Config
    from handpose_tpu.models import build_model

    if model_name == "ThreeDimHandPose":
        xfer._ref_config(input_channels=3, keypoint_num=21,
                         resnet_out_feature_dim=feat_dim,
                         joint_order_switched=True, is_inference=False,
                         other_joint_angles_num=23, bone_length_num=20)
        from network.ThreeDimHandPose import ThreeDimHandPose as TorchModel

        torch.manual_seed(0)
        tm = TorchModel(device="cpu")
        cfg = Config(model_name="ThreeDimHandPose", input_channels=3,
                     resnet_out_feature_dim=feat_dim,
                     compute_dtype="float32", joint_order_switched=True)
        params, stats = xfer.transfer_threedimhandpose(tm)
    elif model_name == "MANO3DHandPose":
        mano_pkl = os.path.join(REF, "config", "mano", "models",
                                "MANO_RIGHT.pkl")
        if not os.path.exists(mano_pkl):
            raise SystemExit("MANO asset not available at " + mano_pkl)
        xfer._ref_config(input_channels=3, keypoint_num=21,
                         resnet_out_feature_dim=feat_dim,
                         joint_order_switched=True, is_inference=False,
                         mano_pose_num=10, mano_beta_num=10,
                         mano_right_hand_path=mano_pkl)
        from network.MANO3DHandPose import MANO3DHandPose as TorchModel

        torch.manual_seed(1)
        tm = TorchModel(device="cpu", mano_right_hand_path=mano_pkl)
        from handpose_tpu.nn.mano import load_mano

        cfg = Config(model_name="MANO3DHandPose", input_channels=3,
                     resnet_out_feature_dim=feat_dim,
                     compute_dtype="float32", mano_pose_num=10,
                     joint_order_switched=True)
        params, stats = xfer.transfer_mano3dhandpose(tm)
        model = build_model(cfg, mano=load_mano(mano_pkl))
        return tm, model, params, stats, cfg
    elif model_name == "Resnet50MANO3DHandPose":
        # the only model with the hand-mask + regularization loss path
        # (reference trainval.py:106-110) -- the last loss family without
        # training-dynamics evidence
        mano_pkl = os.path.join(REF, "config", "mano", "models",
                                "MANO_RIGHT.pkl")
        if not os.path.exists(mano_pkl):
            raise SystemExit("MANO asset not available at " + mano_pkl)
        xfer._ref_config(input_channels=3, keypoint_num=21, mano_pose_num=10,
                         network_regress_uv=False, joint_order_switched=True,
                         is_inference=False, mano_right_hand_path=mano_pkl)
        from network.Resnet50MANO3DHandPose import (
            Resnet50MANO3DHandPose as TorchModel)

        torch.manual_seed(4)
        tm = TorchModel(device="cpu", mano_right_hand_path=mano_pkl)
        from handpose_tpu.nn.mano import load_mano

        cfg = Config(model_name="Resnet50MANO3DHandPose", input_channels=3,
                     compute_dtype="float32", mano_pose_num=10,
                     network_regress_uv=False, joint_order_switched=True)
        params, stats = xfer.transfer_resnet50mano(tm)
        model = build_model(cfg, mano=load_mano(mano_pkl))
        return tm, model, params, stats, cfg
    elif model_name == "ThreeHandShapeAndPoseMANO":
        # boukhayma family (M7): dual-stem hand-rolled ResNet-34 trunk
        # with the AvgPool2d(7) top-left-window quirk -> MANO; xyz-only
        # loss (reference trainval.py:100-104).  Needs crop >= 224 so
        # the final feature map is >= 7x7 for the pool window.
        mano_pkl = os.path.join(REF, "config", "mano", "models",
                                "MANO_RIGHT.pkl")
        if not os.path.exists(mano_pkl):
            raise SystemExit("MANO asset not available at " + mano_pkl)
        xfer._ref_config(input_channels=3, keypoint_num=21, mano_pose_num=10,
                         network_regress_uv=False, joint_order_switched=True,
                         is_inference=False, mano_right_hand_path=mano_pkl)
        from network.ThreeHandShapeAndPoseMANO import (
            ThreeHandShapeAndPoseMANO as TorchModel)

        torch.manual_seed(7)
        tm = TorchModel(device="cpu", mano_right_hand_path=mano_pkl)
        from handpose_tpu.nn.mano import load_mano

        cfg = Config(model_name="ThreeHandShapeAndPoseMANO",
                     input_channels=3, compute_dtype="float32",
                     mano_pose_num=10, network_regress_uv=False,
                     joint_order_switched=True)
        params, stats = xfer.transfer_threehandshapeandpose(tm)
        model = build_model(cfg, mano=load_mano(mano_pkl))
        return tm, model, params, stats, cfg
    elif model_name == "TwoDimHandPose":
        # uv-only family: the uv/1e5 loss is the ONLY training signal and
        # validation MPJPE is measured in uv space (reference
        # trainval.py:78-80, inference.py:206-210)
        refcfg = xfer._ref_config(input_channels=3, keypoint_num=21,
                                  resnet_out_feature_dim=feat_dim,
                                  is_inference=False,
                                  joint_order_switched=True)
        refcfg.eypoint_num = 21   # reference typo (TwoDimHandPose.py:30):
        #                           set so the original code constructs
        from network.TwoDimHandPose import TwoDimHandPose as TorchModel

        torch.manual_seed(5)
        tm = TorchModel(device="cpu")
        cfg = Config(model_name="TwoDimHandPose", input_channels=3,
                     resnet_out_feature_dim=feat_dim,
                     compute_dtype="float32", joint_order_switched=True)
        params, stats = xfer.transfer_twodimhandpose(tm)
    elif model_name == "TwoDimHandPoseWithFK":
        # the uv-loss family: exercises the uv/1e5 aggregation scaling
        # (reference trainval.py:346) and the uv_from_xD blend.  NB the
        # reference trainer cannot run this model as written (its forward
        # returns a 2-tuple, trainval.py:309 unpacks 3 -- documented
        # bit-rot); the torch MODEL executes verbatim here and only this
        # harness adapts the unpack, as the transfer-parity test does.
        xfer._ref_config(input_channels=3, keypoint_num=21,
                         resnet_out_feature_dim=feat_dim,
                         joint_order_switched=True, is_inference=False,
                         other_joint_angles_num=23, bone_length_num=20,
                         uv_from_xD=2.5)
        from network.TwoDimHandPoseWithFK import (
            TwoDimHandPoseWithFK as TorchModel)

        torch.manual_seed(6)
        tm = TorchModel(device="cpu")
        cfg = Config(model_name="TwoDimHandPoseWithFK", input_channels=3,
                     resnet_out_feature_dim=feat_dim,
                     compute_dtype="float32", joint_order_switched=True,
                     uv_from_xd=2.5)
        params, stats = xfer.transfer_twodimhandposewithfk(tm)
    elif model_name == "DiffusionHandPose":
        # small T (20/10 as in the transfer-parity test) keeps the
        # in-forward DDIM loop affordable on CPU while still exercising
        # the DDIM branch (sampling < T) every training step
        xfer._ref_config(input_channels=3, keypoint_num=21,
                         resnet_out_feature_dim=feat_dim,
                         condition_feat_dim=cond_dim, joint_order_switched=True,
                         is_inference=False, other_joint_angles_num=23,
                         bone_length_num=20, num_timesteps=diff_T,
                         num_sampling_timesteps=diff_sampling, batch_size=8)
        from network.DiffusionHandPose import DiffusionHandPose as TorchModel

        torch.manual_seed(3)
        tm = TorchModel(device="cpu")
        cfg = Config(model_name="DiffusionHandPose", input_channels=3,
                     resnet_out_feature_dim=feat_dim, condition_feat_dim=cond_dim,
                     compute_dtype="float32", joint_order_switched=True,
                     num_timesteps=diff_T, num_sampling_timesteps=diff_sampling)
        params, stats = xfer.transfer_diffusionhandpose(tm)
    elif model_name == "OnlyThreeDimHandPose":
        # direct-regression family (M4): backbone -> 63-d xyz, no FK.
        # Twin-trained under the measured-chaos criterion (fast
        # unconstrained descent; see test_twin_training_convergence_direct3d)
        # and used by the checkpoint converter.
        xfer._ref_config(input_channels=3, keypoint_num=21,
                         resnet_out_feature_dim=feat_dim,
                         joint_order_switched=True, is_inference=False)
        from network.OnlyThreeDimHandPose import (
            OnlyThreeDimHandPose as TorchModel)

        torch.manual_seed(8)
        tm = TorchModel(device="cpu")
        cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                     resnet_out_feature_dim=feat_dim,
                     compute_dtype="float32", joint_order_switched=True)
        params, stats = xfer.transfer_onlythreedimhandpose(tm)
    elif model_name == "Hand3DPoseNet":
        # canonical+viewpoint MLP family (M9): twin-trained (strict at
        # CLI settings; measured-chaos criterion at the small test config,
        # see test_twin_training_convergence_posenet) and used by the
        # checkpoint converter.
        xfer._ref_config(input_channels=3, keypoint_num=21,
                         resnet_out_feature_dim=feat_dim,
                         joint_order_switched=True, is_inference=False)
        from network.Hand3DPoseNet import Hand3DPoseNet as TorchModel

        torch.manual_seed(9)
        tm = TorchModel(device="cpu")
        cfg = Config(model_name="Hand3DPoseNet", input_channels=3,
                     resnet_out_feature_dim=feat_dim,
                     compute_dtype="float32", joint_order_switched=True)
        params, stats = xfer.transfer_hand3dposenet(tm)
    elif model_name == "Hand3DPosePriorNetwork":
        xfer._ref_config(input_channels=21, keypoint_num=21,
                         is_inference=False, joint_order_switched=True)
        from network.Hand3DPosePriorNetwork import (
            Hand3DPosePriorNetwork as TorchModel)

        torch.manual_seed(2)
        tm = TorchModel(device="cpu")
        cfg = Config(model_name="Hand3DPosePriorNetwork",
                     input_channels=21, compute_dtype="float32",
                     joint_order_switched=True)
        params, stats = xfer.transfer_flagship(tm)
    else:
        raise SystemExit(f"unsupported twin model {model_name!r}")
    model = build_model(cfg)
    return tm, model, params, stats, cfg


def m5_draws(s: int, B: int, n_T: int, n_samp: int):
    """Replay-capture the torch reference's per-forward RNG draws for
    DiffusionHandPose so the identical values can be injected into the
    JAX step.  Draw order inside the reference training forward
    (DiffusionHandPose.py:44-52): ddim_sample first -- x_T
    (conditionalDiffusion.py:683) then one per-step noise for every
    time_next >= 0 pair, i.e. n_samp-1 draws (:703; the final pair hits
    time_next < 0 and `continue`s before drawing) -- then the loss's
    t = randint (:795) and q_sample noise = randn (:754).  With eta=0 the
    per-step noises are multiplied by sigma=0, so only x_T, t and the
    loss noise shape the outcome."""
    import torch

    torch.manual_seed(s)
    x_T = torch.randn(B, 1, 63)
    for _ in range(n_samp - 1):
        torch.randn(B, 1, 63)
    t = torch.randint(0, n_T, (B,))
    noise = torch.randn(B, 1, 63)
    return (x_T.numpy(), t.numpy().astype(np.int32), noise.numpy())


def torch_inputs(batch, cfg):
    import torch

    from handpose_tpu.data.preprocess import model_input

    inp_nhwc = np.asarray(model_input(batch, cfg.input_channels))
    inp = torch.tensor(inp_nhwc.transpose(0, 3, 1, 2))
    B = inp.shape[0]
    pose_x0 = torch.tensor(
        batch["keypoint_xyz21_rel_normed"].reshape(B, 1, -1))
    return (inp, torch.tensor(batch["camera_intrinsic_matrix"]),
            torch.tensor(batch["keypoint_scale"]),
            torch.tensor(batch["keypoint_xyz_root"]), pose_x0)


def run_twin(model_name: str, n_train: int = 200, n_val: int = 48,
             batch_size: int = 8, epochs: int = 4, crop: int = 64,
             sigma: float = 6.25, feat_dim: int = 256, seed: int = 0,
             data_root: str | None = None, shadow: bool = False,
             shadow_seeds: int = 1,
             overrides: list[str] | None = None) -> dict:
    """Train both frameworks in lockstep; return the trajectories.

    With ``shadow=True`` the JAX loop runs again from an init perturbed
    by 1 part in 1e6 (rademacher signs), measuring the training loop's
    OWN sensitivity to rounding-scale differences.  For chaotic loss
    surfaces (the uv-projection families) torch-vs-JAX divergence at 100
    steps is dominated by Lyapunov amplification of per-op float32
    rounding, and the shadow divergence is the honest yardstick: a
    semantic bug shows up as torch-vs-JAX >> shadow, while chaos shows
    up as torch-vs-JAX ~ shadow.

    ``shadow_seeds``: number of independently-perturbed shadow runs.  A
    single shadow is ONE sample of a chaotic band; an ensemble bounds
    torch-vs-JAX by the band's measured spread (``shadow_ensemble_*``
    keys are the per-seed lists, ``shadow_max_epoch_val_rel_diff`` the
    ensemble max)."""
    import jax
    import jax.numpy as jnp
    import torch

    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
    from handpose_tpu.train.state import TrainState, make_optimizer
    from handpose_tpu.train.steps import make_eval_step, make_train_step

    tmpdir = None
    if data_root is None:
        tmpdir = tempfile.TemporaryDirectory(prefix="twin_rhd_")
        data_root = tmpdir.name
        write_synthetic_rhd(data_root, "training", n=n_train, seed=seed)
        write_synthetic_rhd(data_root, "evaluation", n=n_val,
                            seed=seed + 1)
    train_ds = RHDDataset(data_root, "training")
    val_ds = RHDDataset(data_root, "evaluation")
    n_train = min(n_train, len(train_ds))
    n_val = min(n_val, len(val_ds)) // batch_size * batch_size
    steps_per_epoch = n_train // batch_size

    # identical epoch batch orders for both frameworks
    train_idx = []
    for e in range(epochs):
        order = np.random.default_rng(seed * 100003 + e).permutation(n_train)
        train_idx.append([order[s:s + batch_size]
                          for s in range(0, steps_per_epoch * batch_size,
                                         batch_size)])
    val_idx = [[np.arange(s, s + batch_size)
                for s in range(0, n_val, batch_size)]]

    train_batches = make_epoch_batches(train_ds, train_idx, crop, sigma)
    val_batches = make_epoch_batches(val_ds, val_idx, crop, sigma)[0]

    tm, model, params, stats, cfg = build_pair(model_name, feat_dim)
    cfg = cfg.replace(max_epoch=epochs)
    if overrides:
        # JAX-side-only Config overrides (e.g. bn_variance=fast): measures
        # whether a knob's numerics stay inside the chaos band vs the
        # UNMODIFIED torch reference
        from handpose_tpu.config import apply_overrides
        from handpose_tpu.models import build_model as _bm
        cfg = apply_overrides(cfg, overrides)
        model = _bm(cfg)
    trainer_b = model_name in ("Hand3DPoseNet", "Hand3DPosePriorNetwork")
    m5 = model_name == "DiffusionHandPose"
    m2 = model_name == "TwoDimHandPoseWithFK"
    m1 = model_name == "TwoDimHandPose"

    # --- torch side: reference recipe --------------------------------
    sys.path.insert(0, REF)
    from criterions.loss import LossCalculation as RefLoss

    opt = torch.optim.Adam(tm.parameters(), lr=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs,
                                                       eta_min=1e-5)
    gates = cfg.loss_gates
    crit = RefLoss(device="cpu", comp_xyz_loss=gates["xyz"],
                   comp_uv_loss=gates["uv"],
                   comp_hand_mask_loss=gates["hand_mask"],
                   comp_regularization_loss=gates["regularization"])

    def torch_loss(batch):
        inp, K, scale, root, pose_x0 = torch_inputs(batch, cfg)
        vis = torch.tensor(batch["keypoint_vis21"])
        if trainer_b:
            (rel, can, rot), _, _ = tm(inp, K, scale, root, pose_x0)
            l_xyz, *_ = crit(can, torch.tensor(
                batch["kp_coord_xyz21_rel_can"]), None, None, vis)
            l_rot = torch.mean(torch.square(
                rot - torch.tensor(batch["rot_mat"])))
            return l_xyz + l_rot, can
        if m2:
            # the reference M2 forward returns a 2-tuple (bit-rot,
            # TwoDimHandPoseWithFK.py:84); adapt the unpack only
            (xyz, uv, *_), diff_loss = tm(inp, K, scale, root, pose_x0)
            tb = None
        else:
            (xyz, uv, *_), diff_loss, tb = tm(inp, K, scale, root, pose_x0)
        theta, beta = (tb if tb is not None else (None, None))
        l_xyz, l_uv, _, l_mask, l_reg = crit(
            xyz, torch.tensor(batch["keypoint_xyz21"]), uv,
            torch.tensor(batch["keypoint_uv21"]), vis,
            hand_mask=torch.tensor(batch["right_hand_mask"]),
            theta=theta, beta=beta)
        total = l_xyz if l_xyz is not None else torch.zeros(())
        if l_uv is not None:            # uv/1e5 scaling (trainval.py:346)
            total = total + l_uv / 1e5
        if m5:
            # reference M5 gates: xyz + diffusion (trainval.py:85-88)
            total = total + diff_loss
        if l_mask is not None:          # M8 gates (trainval.py:106-110)
            total = total + l_mask
        if l_reg is not None:
            total = total + l_reg
        return total, (uv if m1 else xyz)

    def torch_val_mpjpe():
        tm.eval()
        s, c = 0.0, 0.0
        with torch.no_grad():
            for i, batch in enumerate(val_batches):
                if m5:
                    # pin the eval-time x_T draw; same seed is replayed
                    # for the JAX side's injected init_noise below
                    torch.manual_seed(seed * 7919 + i)
                _, pred = torch_loss(batch)
                gt = torch.tensor(
                    batch["kp_coord_xyz21_rel_can"] if trainer_b
                    else batch["keypoint_uv21"] if m1
                    else batch["keypoint_xyz21"])
                dist = torch.sqrt(torch.sum((pred - gt) ** 2, dim=2))
                v = torch.tensor(batch["keypoint_vis21"]).reshape(dist.shape)
                s += float(torch.sum(dist * v)) * 1000.0
                c += float(torch.sum(v))
        return s / c

    # --- jax side: production step programs --------------------------
    # DEEP-COPY the transferred trees (see deep_copy_tree): without the
    # copy, the torch ``opt.step()`` that runs before each JAX step would
    # silently mutate the JAX side's initial params (caught via the
    # chaotic M2 uv term, which amplified the one-step offset 20x)
    deep = deep_copy_tree
    tx = make_optimizer(1e-4, 1e-5, epochs, steps_per_epoch)
    state = TrainState.create(
        apply_fn=model.apply,
        params=deep(params), tx=tx,
        batch_stats=deep(stats))
    if shadow:
        # snapshot the pristine init NOW: the torch loop below mutates
        # the transfer views in-place, and the primary JAX loop donates
        # (deletes) the first state's buffers
        params0, stats0 = deep(params), deep(stats)
    train_step = make_train_step(model, cfg)
    eval_step = make_eval_step(model, cfg)

    def jax_val_mpjpe(state):
        s, c = 0.0, 0.0
        for i, batch in enumerate(val_batches):
            if m5:
                x_T, _, _ = m5_draws(seed * 7919 + i, batch_size,
                                     cfg.num_timesteps,
                                     cfg.num_sampling_timesteps)
                batch = {**batch, "_inject_init_noise": x_T}
            m = eval_step(state, batch, jax.random.PRNGKey(0))
            s += float(m["mpjpe_sum"])
            c += float(m["mpjpe_count"])
        return s / c

    # --- torch loop (fully independent of the JAX loop) --------------
    torch_losses, torch_vals = [], []
    gstep = 0
    for epoch in range(epochs):
        tm.train()
        for batch in train_batches[epoch]:
            if m5:
                # the torch forward draws its own (x_T, per-step, t,
                # noise); re-seed so the SAME values can be replayed for
                # injection into the JAX step below
                torch.manual_seed(seed * 1000003 + gstep * 9176 + 7)
            opt.zero_grad()
            tl, _ = torch_loss(batch)
            tl.backward()
            opt.step()
            torch_losses.append(float(tl.detach()))
            gstep += 1
        sched.step()
        torch_vals.append(torch_val_mpjpe())

    # --- JAX loop (same batches, same order; replayed torch draws) ---
    def jax_loop(state):
        losses, vals = [], []
        rng = jax.random.PRNGKey(7)
        gstep = 0
        for epoch in range(epochs):
            for batch in train_batches[epoch]:
                jbatch = batch
                if m5:
                    x_T, t_draw, n_draw = m5_draws(
                        seed * 1000003 + gstep * 9176 + 7, batch_size,
                        cfg.num_timesteps, cfg.num_sampling_timesteps)
                    jbatch = {**batch, "_inject_init_noise": x_T,
                              "_inject_diff_t": t_draw,
                              "_inject_diff_noise": n_draw}
                rng, srng = jax.random.split(rng)
                state, metrics = train_step(state, jbatch, srng)
                losses.append(float(metrics["loss"]))
                gstep += 1
            vals.append(jax_val_mpjpe(state))
        return np.asarray(losses), np.asarray(vals)

    j_l, j_v = jax_loop(state)

    def rel(a, b):
        """elementwise |a-b|/|a| with a zero guard."""
        return np.abs(a - b) / np.maximum(np.abs(a), 1e-8)

    t_l, t_v = np.asarray(torch_losses), np.asarray(torch_vals)
    res = {
        "model": model_name,
        "steps": len(torch_losses),
        "epochs": epochs,
        "torch_losses": t_l.round(6).tolist(),
        "jax_losses": j_l.round(6).tolist(),
        "torch_val_mpjpe": t_v.round(5).tolist(),
        "jax_val_mpjpe": j_v.round(5).tolist(),
        "final_val_rel_diff": float(rel(t_v, j_v)[-1]),
        "max_epoch_val_rel_diff": float(np.max(rel(t_v, j_v))),
        "mean_loss_rel_diff": float(np.mean(rel(t_l, j_l))),
        # robust companion for discontinuous losses: M8's hand-mask term
        # is an integer-gather coverage ratio (reference loss.py:92-111)
        # that steps by O(1/GT_N) when a single uv cell flips and crosses
        # zero, so per-step RELATIVE diffs are unbounded even when the
        # trajectories coincide -- the median is the right summary there
        "median_loss_rel_diff": float(np.median(rel(t_l, j_l))),
        # early-horizon lockstep, BEFORE chaotic amplification can act:
        # a semantic divergence is visible from step 1; rounding chaos
        # needs tens of steps to grow 1e-7-scale differences
        "early10_loss_rel_diff": float(np.mean(rel(t_l, j_l)[:10])),
        "early25_loss_rel_diff": float(np.mean(rel(t_l, j_l)[:25])),
    }

    if shadow:
        # JAX run(s) from 1e-6-perturbed inits: measures the loop's
        # intrinsic rounding-chaos amplification on this exact loss
        # surface / batch schedule.  Each shadow seed draws independent
        # rademacher signs; the ensemble max over seeds is the honest
        # bound for torch-vs-JAX on a chaotic family (one draw is one
        # sample of the band).
        ens_val_diff, ens_mean_loss, ens_e10 = [], [], []
        last = {}
        for k in range(shadow_seeds):
            key = jax.random.PRNGKey(1234 + 7717 * k)
            leaves, treedef = jax.tree.flatten(params0)
            pleaves = [
                x * (1.0 + 1e-6 * jax.random.rademacher(
                    jax.random.fold_in(key, i), x.shape).astype(x.dtype))
                for i, x in enumerate(leaves)]
            pstate = TrainState.create(
                apply_fn=model.apply,
                params=jax.tree.unflatten(treedef, pleaves), tx=tx,
                batch_stats=deep(stats0))
            s_l, s_v = jax_loop(pstate)
            ens_val_diff.append(float(np.max(rel(j_v, s_v))))
            ens_mean_loss.append(float(np.mean(rel(j_l, s_l))))
            ens_e10.append(float(np.mean(rel(j_l, s_l)[:10])))
            last = {
                "shadow_jax_losses": s_l.round(6).tolist(),
                "shadow_jax_val_mpjpe": s_v.round(5).tolist(),
                "shadow_median_loss_rel_diff": float(
                    np.median(rel(j_l, s_l))),
                "shadow_early25_loss_rel_diff": float(np.mean(rel(j_l,
                                                                  s_l)[:25])),
            }
        res.update(last)
        res.update({
            # ensemble max (== the single value when shadow_seeds=1)
            "shadow_max_epoch_val_rel_diff": max(ens_val_diff),
            "shadow_mean_loss_rel_diff": max(ens_mean_loss),
            "shadow_early10_loss_rel_diff": max(ens_e10),
            "shadow_seeds": shadow_seeds,
            "shadow_ensemble_val_rel_diff": ens_val_diff,
            "shadow_ensemble_mean_loss_rel_diff": ens_mean_loss,
            "shadow_ensemble_early10_loss_rel_diff": ens_e10,
        })
    if tmpdir is not None:
        tmpdir.cleanup()
    return res


def main():
    # parity evidence wants deterministic float32 on both sides: force the
    # CPU backend (the image's sitecustomize pins the tunneled TPU) and
    # highest matmul precision, same as tests/conftest.py
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="ThreeDimHandPose",
                   choices=["ThreeDimHandPose", "Hand3DPosePriorNetwork",
                            "MANO3DHandPose", "DiffusionHandPose",
                            "Resnet50MANO3DHandPose", "TwoDimHandPoseWithFK",
                            "TwoDimHandPose", "ThreeHandShapeAndPoseMANO",
                            "OnlyThreeDimHandPose", "Hand3DPoseNet"])
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--n-train", type=int, default=200)
    p.add_argument("--n-val", type=int, default=48)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--feat-dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shadow", action="store_true",
                   help="also run the 1e-6-perturbed JAX shadow twin "
                        "(chaos yardstick)")
    p.add_argument("--shadow-seeds", type=int, default=1,
                   help="number of independently-perturbed shadow runs; "
                        "the ensemble max bounds the chaos band")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="JAX-side Config override (repeatable), e.g. "
                        "--set bn_variance=fast")
    args = p.parse_args()
    res = run_twin(args.model, n_train=args.n_train, n_val=args.n_val,
                   batch_size=args.batch_size, epochs=args.epochs,
                   crop=args.crop, feat_dim=args.feat_dim, seed=args.seed,
                   shadow=args.shadow, shadow_seeds=args.shadow_seeds,
                   overrides=args.set)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
