"""Reference-checkpoint migration: torch .pth.tar -> Orbax run dir.

tools/convert_reference_checkpoint.py maps the reference trainer's
``{epoch, state_dict, optimizer, MPJPE}`` checkpoints (reference
trainval.py:618-623) onto our run-dir layout: params/batch_stats via the
parity-pinned weight-transfer mapping, torch Adam ``exp_avg``/
``exp_avg_sq``/``step`` onto optax ``mu``/``nu``/``count``, and
epoch/MPJPE onto the resume metadata.  This test round-trips a real
torch-trained checkpoint through the converter and back through the
production ``filtered_resume`` + forward path.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not mounted")

for p in (os.path.join(os.path.dirname(__file__), "..", "tools"),
          os.path.dirname(__file__)):
    if p not in sys.path:
        sys.path.insert(0, p)


def test_convert_reference_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from convert_reference_checkpoint import convert
    from twin_train_parity import build_pair

    # --- produce a REAL torch-trained reference checkpoint ----------
    tm, _, _, _, _ = build_pair("ThreeDimHandPose", 128)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-4)
    g = torch.Generator().manual_seed(42)
    tm.train()
    for _ in range(3):
        inp = torch.randn(2, 3, 64, 64, generator=g)
        K = torch.eye(3).expand(2, 3, 3) * 100.0
        scale = torch.rand(2, 1, generator=g) + 0.5
        root = torch.randn(2, 3, generator=g) * 0.01
        (xyz, _uv, _), _, _ = tm(inp, K, scale, root)
        loss = xyz.square().mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
    ckpt = {"epoch": 7, "state_dict": tm.state_dict(),
            "optimizer": opt.state_dict(), "MPJPE": 123.4}
    pth = os.path.join(tmp_path, "DF_model_best.pth.tar")
    torch.save(ckpt, pth)

    # --- convert ------------------------------------------------------
    out_dir = os.path.join(tmp_path, "run")
    res = convert(pth, "ThreeDimHandPose", out_dir, feat_dim=128)
    assert res["finetune"] is False
    assert res["epoch"] == 7
    assert res["optimizer_carried"] is True
    assert res["params_matched"] == res["params_total"]
    assert os.path.exists(os.path.join(out_dir, "config.json"))

    # --- restore through the PRODUCTION path --------------------------
    from handpose_tpu.config import Config
    from handpose_tpu.models import build_model
    from handpose_tpu.train.checkpoints import filtered_resume
    from handpose_tpu.train.state import TrainState, make_optimizer

    with open(os.path.join(out_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    assert cfg.model_name == "ThreeDimHandPose"
    model = build_model(cfg)

    img = np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32)
    K = (np.eye(3, dtype=np.float32) * 100.0)[None].repeat(2, 0)
    scale = np.ones((2, 1), np.float32)
    root = np.zeros((2, 3), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img), jnp.asarray(K),
                           jnp.asarray(scale), jnp.asarray(root),
                           train=False)
    tx = make_optimizer(cfg.lr, cfg.lr_min, cfg.max_epoch, 1)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"))
    state, start_epoch, best, finetune = filtered_resume(
        state, os.path.join(out_dir, "model_best"))
    assert (start_epoch, finetune) == (7, False)
    assert best == pytest.approx(123.4)

    # forward parity: the restored Flax model reproduces the torch
    # checkpoint's eval forward (trained BN running stats included)
    tm.eval()
    with torch.no_grad():
        (t_xyz, _, _), _, _ = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(K),
            torch.tensor(scale), torch.tensor(root))
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(img), jnp.asarray(K), jnp.asarray(scale),
        jnp.asarray(root), train=False)
    np.testing.assert_allclose(np.asarray(out.xyz), t_xyz.numpy(),
                               atol=1e-4, rtol=1e-4)

    # Adam state carried: counts == torch step, and the mu/nu trees hold
    # exactly the torch moments (sums are layout-invariant; the per-leaf
    # placement reuses the parity-pinned transfer mapping)
    adam = state.opt_state[0]
    assert int(adam.count) == 3
    assert int(state.opt_state[1].count) == 3
    t_mu = sum(float(e["exp_avg"].sum())
               for e in opt.state_dict()["state"].values())
    t_nu = sum(float(e["exp_avg_sq"].sum())
               for e in opt.state_dict()["state"].values())
    j_mu = sum(float(np.sum(x)) for x in jax.tree.leaves(adam.mu))
    j_nu = sum(float(np.sum(x)) for x in jax.tree.leaves(adam.nu))
    assert j_mu == pytest.approx(t_mu, rel=1e-5)
    assert j_nu == pytest.approx(t_nu, rel=1e-5)


def test_convert_flagship_checkpoint(tmp_path):
    """Second architecture family through the converter: the flagship
    (Hand3DPosePriorNetwork, trainer-B, 21-channel scoremap input, twin
    ResNet-18 trunks).  No optimizer in the .pth.tar -> params/epoch/best
    carry, optimizer does not."""
    from convert_reference_checkpoint import convert
    from twin_train_parity import build_pair

    tm, _, _, _, _ = build_pair("Hand3DPosePriorNetwork", 128)
    pth = os.path.join(tmp_path, "model_best.pth.tar")
    torch.save({"epoch": 3, "state_dict": tm.state_dict(),
                "MPJPE": 77.0}, pth)

    out_dir = os.path.join(tmp_path, "run")
    res = convert(pth, "Hand3DPosePriorNetwork", out_dir, feat_dim=128)
    assert res["finetune"] is False
    assert res["epoch"] == 3
    assert res["best_mpjpe"] == pytest.approx(77.0)
    assert res["optimizer_carried"] is False
    assert res["params_matched"] == res["params_total"]

    from handpose_tpu.config import Config

    with open(os.path.join(out_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    assert cfg.model_name == "Hand3DPosePriorNetwork"
    assert cfg.input_channels == 21
    assert os.path.isdir(os.path.join(out_dir, "model_best"))


def test_convert_mismatched_checkpoint_is_finetune(tmp_path):
    """A checkpoint whose key set differs (reference strict=False path,
    trainval.py:181-192) must convert as FINETUNE: params that match
    load, but epoch/optimizer/best are NOT carried."""
    from convert_reference_checkpoint import convert
    from twin_train_parity import build_pair

    tm, _, _, _, _ = build_pair("ThreeDimHandPose", 128)
    sd = tm.state_dict()
    dropped = next(iter(sd.keys()))
    sd = {k: v for k, v in sd.items() if k != dropped}
    pth = os.path.join(tmp_path, "partial.pth.tar")
    torch.save({"epoch": 9, "state_dict": sd, "optimizer": {},
                "MPJPE": 50.0}, pth)

    out_dir = os.path.join(tmp_path, "run")
    res = convert(pth, "ThreeDimHandPose", out_dir, feat_dim=128)
    assert res["finetune"] is True
    assert res["epoch"] == 0
    assert res["optimizer_carried"] is False
    assert res["best_mpjpe"] == float("inf")
