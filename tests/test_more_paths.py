"""Coverage for less-travelled paths: diffusion training step, M2
inference triple, M7 uv regression, crop-free preprocessing, sharded
device_batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.config import Config
from handpose_tpu.data.preprocess import RawBatch, preprocess_batch
from handpose_tpu.data.synthetic import fake_sample_batch
from handpose_tpu.models import build_model
from handpose_tpu.nn.mano import synthetic_mano
from handpose_tpu.data.preprocess import model_input
from handpose_tpu.train.state import create_train_state
from handpose_tpu.train.steps import make_train_step


def _state_and_batch(cfg, B=4, S=64):
    model = build_model(cfg, mano=synthetic_mano())
    batch = fake_sample_batch(B, S, cfg.input_channels, seed=0)
    inp = model_input(batch, cfg.input_channels)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(B, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    return model, state, batch


def test_diffusion_hand_pose_train_step():
    """Full M5 training step: DDIM sampling inside the forward + denoiser
    loss, gradients through bone heads + FK."""
    cfg = Config(model_name="DiffusionHandPose", input_channels=3,
                 input_img_shape=(64, 64), condition_feat_dim=32,
                 num_timesteps=8, num_sampling_timesteps=4,
                 resnet_out_feature_dim=128, max_epoch=2)
    model, state, batch = _state_and_batch(cfg)
    step = make_train_step(model, cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_diffusion"]))
    assert "loss_xyz" in metrics  # FK branch ran (sampling in train)


def test_diffusion_sample_in_train_off():
    cfg = Config(model_name="DiffusionHandPose", input_channels=3,
                 input_img_shape=(64, 64), condition_feat_dim=32,
                 num_timesteps=8, num_sampling_timesteps=4,
                 resnet_out_feature_dim=128, max_epoch=2,
                 diffusion_sample_in_train=False)
    model, state, batch = _state_and_batch(cfg)
    step = make_train_step(model, cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert "loss_xyz" not in metrics          # FK branch skipped
    assert np.isfinite(float(metrics["loss_diffusion"]))


def test_two_dim_fk_inference_triple():
    cfg = Config(model_name="TwoDimHandPoseWithFK", input_channels=3,
                 input_img_shape=(64, 64), resnet_out_feature_dim=128)
    model = build_model(cfg, is_inference=True)
    batch = fake_sample_batch(2, 64, 3, seed=0)
    inp = model_input(batch, 3)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"])
    v = model.init({"params": jax.random.PRNGKey(0)}, *args)
    out = model.apply(v, *args)
    assert out.uv_aux is not None and out.uv_aux.shape == (2, 21, 2)
    assert out.uv.shape == (2, 21, 2) and out.xyz.shape == (2, 21, 3)


def test_three_hand_shape_regress_uv():
    cfg = Config(model_name="ThreeHandShapeAndPoseMANO", input_channels=24,
                 input_img_shape=(64, 64), network_regress_uv=True)
    model = build_model(cfg, mano=synthetic_mano())
    batch = fake_sample_batch(2, 64, 24, seed=0)
    inp = model_input(batch, 24)
    v = model.init({"params": jax.random.PRNGKey(0)}, inp)
    out = model.apply(v, inp)
    assert out.uv is not None and out.uv.shape == (2, 21, 2)


def test_preprocess_no_crop(fixtures):
    raw_d = fixtures("rhd_raw")
    raw = RawBatch(**{k: jnp.asarray(v) for k, v in raw_d.items()})
    out = preprocess_batch(raw, hand_crop=False)
    assert "image_crop" not in out
    assert out["scoremap"].shape == (6, 21, 320, 320)
    assert out["right_hand_mask"].shape == (6, 320, 320)


def test_device_batches_with_sharding(tmp_path):
    from handpose_tpu.data import RHDDataset, device_batches, \
        write_synthetic_rhd
    from handpose_tpu.parallel.mesh import make_mesh, data_sharding

    write_synthetic_rhd(str(tmp_path), "evaluation", n=8, seed=0)
    ds = RHDDataset(str(tmp_path), "evaluation")
    mesh = make_mesh(shape=(8,), axis_names=("data",))
    sharding = data_sharding(mesh)
    it = device_batches(ds.batches(8), sharding=sharding)
    sample = next(it)
    assert sample["image_crop"].shape == (8, 256, 256, 3)
    # batch axis is sharded across the mesh
    assert len(sample["image_crop"].sharding.device_set) == 8


def test_compilation_cache_writes_and_hits(tmp_path):
    """Config.compilation_cache_dir points JAX's persistent compile cache
    at a directory: compiled programs persist to disk (warm restarts skip
    the first-compile cost -- the serving/preemption cold-start fix)."""
    from handpose_tpu.utils.device_info import enable_compilation_cache

    cache = tmp_path / "xla_cache"
    cache.mkdir()
    try:
        enable_compilation_cache(str(cache))

        @jax.jit
        def f(x):
            return jnp.sin(x) @ x.T

        f(jnp.ones((16, 16))).block_until_ready()
        entries = list(cache.rglob("*"))
        assert any(p.is_file() for p in entries), \
            "no cache entry written by a fresh compile"

        # simulate a warm restart: drop the in-memory executable and
        # re-trace -- the recompile must be served from the persistent
        # cache (no new entry; the key includes the jit name, so an
        # identical re-trace of the SAME function is the restart case)
        n_before = sum(p.is_file() for p in entries)
        f.clear_cache()
        f(jnp.ones((16, 16))).block_until_ready()
        n_after = sum(p.is_file() for p in cache.rglob("*"))
        assert n_after == n_before
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_worker_enables_compilation_cache(tmp_path):
    """The Worker applies cfg.compilation_cache_dir before compiling."""
    cache = tmp_path / "cc"
    cache.mkdir()
    from handpose_tpu.train.trainer import Worker

    cfg = Config(model_name="OnlyThreeDimHandPose", use_fake_data=True,
                 dataset_name="synthetic", batch_size=2, max_epoch=1,
                 input_img_shape=(64, 64), sigma=5.0,
                 compilation_cache_dir=str(cache))
    try:
        Worker(cfg, run_dir=str(tmp_path / "run"))
        assert jax.config.jax_compilation_cache_dir == str(cache)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
