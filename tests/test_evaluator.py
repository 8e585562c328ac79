"""Evaluator harness tests (synthetic backend)."""

import os

import numpy as np

from handpose_tpu.config import Config
from handpose_tpu.infer import Evaluator, model_name_from_path


def test_model_name_from_path():
    p = "logs/MANO3DHandPose/RHD/run_2024/model_best"
    assert model_name_from_path(p) == "MANO3DHandPose"


def test_evaluator_synthetic(tmp_path):
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="synthetic", infer_batch_size=8,
                 input_img_shape=(64, 64), resnet_out_feature_dim=128)
    ev = Evaluator(cfg, visualize_dir=str(tmp_path))
    mpjpe = ev.evaluate(max_batches=2, visualize_first_n=2)
    assert np.isfinite(mpjpe) and mpjpe > 0
    imgs = os.listdir(tmp_path / "img")
    assert len(imgs) == 2


def test_evaluator_trains_then_improves(tmp_path):
    """Checkpoint round trip through the evaluator: a trained model must
    evaluate better than an untrained one on the fixed fake data."""
    from handpose_tpu.train import Worker

    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="synthetic", use_fake_data=True,
                 batch_size=8, infer_batch_size=8, input_img_shape=(64, 64),
                 resnet_out_feature_dim=128, max_epoch=2,
                 save_log_dir=str(tmp_path))
    w = Worker(cfg)
    w.run(fast_debug=True)
    ckpt = os.path.join(os.path.abspath(w.run_dir), "checkpoint")
    assert os.path.isdir(ckpt)

    base = Evaluator(cfg).evaluate(max_batches=1)
    trained = Evaluator(cfg, ckpt_path=ckpt).evaluate(max_batches=1)
    assert trained < base


def test_export_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from handpose_tpu.infer.export import (export_forward,
                                           load_exported_file, save_exported)
    from handpose_tpu.models import build_model

    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 input_img_shape=(64, 64), resnet_out_feature_dim=128)
    model = build_model(cfg, is_inference=True)
    B = 2
    img = jnp.zeros((B, 64, 64, 3))
    K = jnp.tile(jnp.asarray([[300., 0, 32], [0, 300., 32], [0, 0, 1]]),
                 (B, 1, 1))
    scale = jnp.ones((B, 1))
    root = jnp.zeros((B, 3))
    var = model.init({"params": jax.random.PRNGKey(0)}, img, K, scale, root)
    blob = export_forward(cfg, var, B)
    p = tmp_path / "model.jaxexport"
    save_exported(str(p), blob)
    fn = load_exported_file(str(p))
    xyz, uv = fn(np.asarray(img), np.asarray(K), np.asarray(scale),
                 np.asarray(root))
    ref = model.apply(var, img, K, scale, root)
    np.testing.assert_allclose(xyz, ref.xyz, atol=1e-5)
    np.testing.assert_allclose(uv, ref.uv, atol=1e-3)


def test_export_fused_pipeline_roundtrip():
    """The fused serving program (raw -> preprocess + forward) exports
    to StableHLO and replays identically to the in-framework path."""
    import jax
    import jax.numpy as jnp

    from handpose_tpu.data.preprocess import (RawBatch, model_input,
                                              preprocess_batch)
    from handpose_tpu.infer.export import (export_fused_pipeline,
                                           load_exported_pipeline)
    from handpose_tpu.models import build_model

    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 input_img_shape=(64, 64), resnet_out_feature_dim=128)
    model = build_model(cfg, is_inference=True)
    B, S = 2, 80
    rng = np.random.default_rng(0)
    K = np.tile(np.asarray([[80., 0, 40], [0, 80., 40], [0, 0, 1]],
                           np.float32), (B, 1, 1))
    xyz = (rng.normal(size=(B, 42, 3)) * 0.05 +
           np.asarray([0, 0, 0.6])).astype(np.float32)
    uvw = np.einsum("bij,bkj->bki", K, xyz)
    raw = RawBatch(
        image=rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        mask=rng.integers(0, 34, (B, S, S), dtype=np.uint8),
        keypoint_uv=(uvw[..., :2] / uvw[..., 2:3]).astype(np.float32),
        keypoint_vis=(rng.uniform(size=(B, 42)) > 0.3).astype(np.float32),
        keypoint_xyz=xyz, camera_K=K)

    sample = preprocess_batch(jax.device_put(raw), crop_size=cfg.crop_size,
                              sigma=cfg.sigma,
                              switch_joint_order=cfg.joint_order_switched)
    inp = model_input(sample, cfg.input_channels)
    var = model.init({"params": jax.random.PRNGKey(0)}, inp,
                     sample["camera_intrinsic_matrix"],
                     sample["keypoint_scale"],
                     sample["keypoint_xyz_root"])
    blob = export_fused_pipeline(cfg, var, B, image_size=(S, S))
    fn = load_exported_pipeline(blob)
    xyz_e, uv_e = fn(raw.image, raw.mask, raw.keypoint_uv,
                     raw.keypoint_vis, raw.keypoint_xyz, raw.camera_K)

    # reference = the SAME fused program jitted in-framework (the
    # export contract is program replay; eager preprocessing can land
    # a crop int-cast one ulp differently, which is not what this pins)
    @jax.jit
    def direct(raw):
        s = preprocess_batch(raw, crop_size=cfg.crop_size, sigma=cfg.sigma,
                             switch_joint_order=cfg.joint_order_switched)
        i = model_input(s, cfg.input_channels)
        out = model.apply(var, i, s["camera_intrinsic_matrix"],
                          s["keypoint_scale"], s["keypoint_xyz_root"],
                          train=False,
                          rngs={"diffusion": jax.random.PRNGKey(cfg.seed)})
        return out.xyz, out.uv

    ref_xyz, ref_uv = direct(jax.device_put(raw))
    np.testing.assert_allclose(np.asarray(xyz_e), np.asarray(ref_xyz),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(uv_e), np.asarray(ref_uv),
                               rtol=1e-5, atol=1e-2)


def test_evaluate_full_pck(tmp_path):
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="synthetic", infer_batch_size=8,
                 input_img_shape=(64, 64), resnet_out_feature_dim=128)
    ev = Evaluator(cfg)
    res = ev.evaluate_full(max_batches=1)
    assert np.isfinite(res["mpjpe"])
    assert res["pck"].shape == (31,)
    assert 0.0 <= res["auc_20_50mm"] <= 1.0
    assert np.all(np.diff(res["pck"]) >= -1e-9)   # monotone curve


def test_evaluator_interhand(tmp_path):
    from handpose_tpu.data.interhand import write_synthetic_interhand

    root = tmp_path / "ih"
    write_synthetic_interhand(str(root), "val", n=8, seed=3)
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="InterHand2.6M", dataset_root_dir=str(root),
                 infer_batch_size=4, input_img_shape=(64, 64),
                 resnet_out_feature_dim=128)
    ev = Evaluator(cfg)
    m = ev.evaluate(max_batches=2)
    assert np.isfinite(m) and m > 0


def test_evaluator_interhand_test_split(tmp_path):
    """interhand_eval_split='test' consumes the test split (the
    reference's separate test harness protocol)."""
    from handpose_tpu.data.interhand import write_synthetic_interhand

    root = tmp_path / "ih"
    write_synthetic_interhand(str(root), "test", n=6, seed=4)
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="InterHand2.6M", dataset_root_dir=str(root),
                 infer_batch_size=3, input_img_shape=(64, 64),
                 resnet_out_feature_dim=128, interhand_eval_split="test")
    ev = Evaluator(cfg)
    assert len(ev._dataset()) == 6
    m = ev.evaluate(max_batches=1)
    assert np.isfinite(m) and m > 0


def test_evaluator_consumes_partial_batch(tmp_path):
    """10 samples at bs=4 -> all 10 evaluated (4+4+2), not 8."""
    from handpose_tpu.data.rhd import write_synthetic_rhd
    from handpose_tpu.train.steps import make_eval_step

    root = tmp_path / "rhd"
    write_synthetic_rhd(str(root), "evaluation", n=10, seed=6)
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="RHD", dataset_root_dir=str(root),
                 infer_batch_size=4, input_img_shape=(64, 64),
                 resnet_out_feature_dim=128)
    ev = Evaluator(cfg)
    total_batches = sum(1 for _ in ev._batches())
    assert total_batches == 3
    sizes = [b["keypoint_xyz21"].shape[0] for b in ev._batches()]
    assert sizes == [4, 4, 2]
    m = ev.evaluate()
    assert np.isfinite(m)


def test_inference_from_run_explicit_flags_win(tmp_path, monkeypatch,
                                               capsys):
    """`inference.py --from_run <dir>` rehydrates the run's config, but
    dataset flags given EXPLICITLY on the command line beat it (a
    migrated/foreign run's config points at data that lives elsewhere).
    The run config here names an RHD root that does not exist; --dataset
    synthetic must win or evaluation dies in FileNotFoundError."""
    import runpy
    import sys

    from handpose_tpu.data.rhd import write_synthetic_rhd
    from handpose_tpu.train import Worker

    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="RHD", dataset_root_dir="/nonexistent/rhd",
                 use_fake_data=True, batch_size=8, infer_batch_size=8,
                 input_img_shape=(64, 64), resnet_out_feature_dim=128,
                 max_epoch=1, save_log_dir=str(tmp_path))
    # train on fake data so the run dir has config.json + checkpoint
    w = Worker(cfg.replace(dataset_name="synthetic"))
    w.run(fast_debug=True)
    run_dir = os.path.abspath(w.run_dir)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())  # the hostile config: bogus RHD root

    root = tmp_path / "rhd"
    write_synthetic_rhd(str(root), "evaluation", n=8, seed=3)
    monkeypatch.setattr(sys, "argv", [
        "inference.py", "--from_run", run_dir,
        "--data_root", str(root), "--batch_size", "4"])
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                "inference.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "MPJPE" in out


def test_empty_eval_returns_nan():
    """Zero visible joints -> NaN + warning, never 0.0 (a 0.0 would read
    as a perfect MPJPE; same semantics as the trainer's None)."""
    import pytest

    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="synthetic", infer_batch_size=8,
                 input_img_shape=(64, 64), resnet_out_feature_dim=128)
    ev = Evaluator(cfg)
    with pytest.warns(UserWarning, match="no visible keypoints"):
        m = ev.evaluate(max_batches=0)
    assert np.isnan(m)


def test_evaluate_full_single_pass_fused(tmp_path):
    """PCK rides the fused eval step (one forward per batch); the fused
    and unfused evaluate_full must agree."""
    from handpose_tpu.data.rhd import write_synthetic_rhd

    root = tmp_path / "rhd"
    write_synthetic_rhd(str(root), "evaluation", n=8, seed=9)
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="RHD", dataset_root_dir=str(root),
                 infer_batch_size=4, input_img_shape=(64, 64),
                 resnet_out_feature_dim=128)
    ev = Evaluator(cfg)
    assert ev.fused
    res = ev.evaluate_full()
    ev2 = Evaluator(cfg.replace(fuse_preprocess=False))
    res2 = ev2.evaluate_full()
    np.testing.assert_allclose(res["mpjpe"], res2["mpjpe"], rtol=1e-4)
    np.testing.assert_allclose(res["pck"], res2["pck"], atol=1e-6)


def test_export_diffusion_model(tmp_path):
    """Exporting DiffusionHandPose must work: its inference forward draws
    from the 'diffusion' rng stream (in-forward DDIM), which export now
    provides (a fixed key -> deterministic artifact)."""
    import jax
    import jax.numpy as jnp

    from handpose_tpu.infer.export import export_forward, load_exported
    from handpose_tpu.models import build_model

    cfg = Config(model_name="DiffusionHandPose", input_channels=3,
                 input_img_shape=(32, 32), resnet_out_feature_dim=64,
                 condition_feat_dim=32, num_timesteps=8,
                 num_sampling_timesteps=4)
    model = build_model(cfg, is_inference=True)
    B = 2
    img = jnp.zeros((B, 32, 32, 3))
    K = jnp.tile(jnp.asarray([[300., 0, 16], [0, 300., 16], [0, 0, 1]]),
                 (B, 1, 1))
    scale = jnp.ones((B, 1))
    root = jnp.zeros((B, 3))
    var = model.init({"params": jax.random.PRNGKey(0),
                      "diffusion": jax.random.PRNGKey(1)},
                     img, K, scale, root)
    blob = export_forward(cfg, var, B)
    fn = load_exported(blob)
    xyz, uv = fn(np.asarray(img), np.asarray(K), np.asarray(scale),
                 np.asarray(root))
    assert np.all(np.isfinite(np.asarray(xyz)))
    assert np.all(np.isfinite(np.asarray(uv)))
    # deterministic artifact: same inputs -> same outputs
    xyz2, _ = fn(np.asarray(img), np.asarray(K), np.asarray(scale),
                 np.asarray(root))
    np.testing.assert_array_equal(np.asarray(xyz), np.asarray(xyz2))
