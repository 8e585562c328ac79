"""Training harness tests: fake-data smoke train, sharded step, resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.config import Config
from handpose_tpu.data.synthetic import fake_sample_batch
from handpose_tpu.models import build_model
from handpose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from handpose_tpu.train import (Worker, cosine_epoch_schedule,
                                filtered_resume, make_eval_step,
                                make_train_step, save_checkpoint)
from handpose_tpu.train.state import create_train_state
from handpose_tpu.data.preprocess import model_input

TINY = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
              batch_size=8, input_img_shape=(64, 64),
              resnet_out_feature_dim=128, use_fake_data=True,
              max_epoch=2, save_log_dir="/tmp/hpt_logs")


def test_cosine_schedule_matches_torch_curve():
    sched = cosine_epoch_schedule(1e-4, 1e-5, 60, steps_per_epoch=5)
    lrs = [float(sched(e * 5)) for e in range(61)]
    assert lrs[0] == pytest.approx(1e-4)
    assert lrs[60] == pytest.approx(1e-5)
    assert lrs[30] == pytest.approx((1e-4 + 1e-5) / 2, rel=1e-6)
    # constant within an epoch
    assert float(sched(3)) == lrs[0]


def test_fake_data_training_reduces_loss(tmp_path):
    cfg = TINY.replace(save_log_dir=str(tmp_path))
    w = Worker(cfg)
    val0 = w.run_epoch(0, "validation")
    for e in range(3):
        w.run_epoch(e, "training")
    val = w.run_epoch(0, "validation")
    assert np.isfinite(val) and val < val0
    import os
    assert os.path.exists(os.path.join(w.run_dir, "provenance.json"))


def test_train_step_loss_decreases():
    cfg = TINY
    model = build_model(cfg)
    batch = fake_sample_batch(8, 64, 3, seed=0)
    inp = model_input(batch, 3)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    step = make_train_step(model, cfg)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(8):
        state, m = step(state, batch, rng)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


def test_sharded_train_step_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(shape=(8,), axis_names=("data",))
    # f32 + non-degenerate images: the piecewise-constant fake image has
    # near-zero per-channel BN variances that amplify reduction-order
    # noise ~40x; random data keeps the honest partition-noise floor
    # (~1e-4) so a tight tolerance can catch real psum/denominator bugs
    cfg = TINY.replace(compute_dtype="float32")
    model = build_model(cfg)
    batch = fake_sample_batch(8, 64, 3, seed=0)
    batch["image_crop"] = jax.random.uniform(
        jax.random.PRNGKey(42), batch["image_crop"].shape,
        minval=-0.5, maxval=0.5)
    inp = model_input(batch, 3)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    state = state.replace(params=replicate(state.params, mesh),
                          batch_stats=replicate(state.batch_stats, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    sharded = shard_batch(batch, mesh)
    step = make_train_step(model, cfg)
    state2, m = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    # parity: sharded step == single-device step on identical inputs
    state_ref = create_train_state(model, cfg, args, jax.random.PRNGKey(0),
                                   10)
    step_ref = make_train_step(model, cfg)
    _, m_ref = step_ref(state_ref, batch, jax.random.PRNGKey(1))
    # identical math modulo fp reduction order (batch-norm statistics are
    # computed globally via psum; summation order differs across shards);
    # f32 noise is ~1e-4, so 1e-3 still catches %-level sharding bugs
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-3)


def test_trainer_b_step():
    cfg = TINY.replace(model_name="Hand3DPosePriorNetwork",
                       input_channels=21)
    model = build_model(cfg)
    batch = fake_sample_batch(4, 64, 21, seed=0)
    inp = model_input(batch, 21)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(4, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    step = make_train_step(model, cfg)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert "loss_rot" in m and np.isfinite(float(m["loss_rot"]))
    ev = make_eval_step(model, cfg)
    em = ev(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(em["mpjpe"]))


def test_checkpoint_save_resume_and_finetune(tmp_path):
    cfg = TINY
    model = build_model(cfg)
    batch = fake_sample_batch(4, 64, 3, seed=0)
    inp = model_input(batch, 3)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(4, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    save_checkpoint(str(tmp_path), state, epoch=5, best_mpjpe=12.5,
                    is_best=True)
    assert os.path.isdir(tmp_path / "checkpoint")
    assert os.path.isdir(tmp_path / "model_best")

    # exact-match resume
    state2 = create_train_state(model, cfg, args, jax.random.PRNGKey(7), 10)
    state2, epoch, best, finetune = filtered_resume(
        state2, str(tmp_path / "checkpoint"))
    assert not finetune and epoch == 5 and best == pytest.approx(12.5)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # architecture change -> finetune (partial load)
    cfg3 = cfg.replace(resnet_out_feature_dim=64)
    model3 = build_model(cfg3)
    state3 = create_train_state(model3, cfg3, args, jax.random.PRNGKey(9), 10)
    state3, epoch3, best3, finetune3 = filtered_resume(
        state3, str(tmp_path / "checkpoint"))
    assert finetune3 and epoch3 == 0 and not np.isfinite(best3)


def test_nan_check_aborts(tmp_path):
    """Failure detection: a poisoned batch must abort with a clear error."""
    cfg = TINY.replace(save_log_dir=str(tmp_path))
    w = Worker(cfg)
    from handpose_tpu.data.synthetic import fake_sample_batch

    batch = fake_sample_batch(8, 64, 3, seed=0)
    batch["keypoint_xyz21"] = batch["keypoint_xyz21"] * np.nan
    import types

    def poisoned(self, split, seed):
        yield batch

    w._epoch_batches = types.MethodType(poisoned, w)
    with pytest.raises(FloatingPointError):
        w.run_epoch(0, "training")


def test_training_reproducible():
    """Same seed, same data -> bitwise-identical first-step losses."""
    cfg = TINY
    losses = []
    for _ in range(2):
        model = build_model(cfg)
        batch = fake_sample_batch(8, 64, 3, seed=3)
        inp = model_input(batch, 3)
        pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
        args = (inp, batch["camera_intrinsic_matrix"],
                batch["keypoint_scale"], batch["keypoint_xyz_root"], pose_x0)
        state = create_train_state(model, cfg, args, jax.random.PRNGKey(5),
                                   10)
        step = make_train_step(model, cfg)
        _, m = step(state, batch, jax.random.PRNGKey(6))
        losses.append(float(m["loss"]))
    assert losses[0] == losses[1]


def test_fused_step_matches_separate(tmp_path):
    """Fused (preprocess-inside-jit) train/eval steps == separate
    preprocess + step on identical raw inputs and rngs."""
    from handpose_tpu.data.preprocess import preprocess_batch
    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
    from handpose_tpu.train.steps import (make_fused_eval_step,
                                          make_fused_train_step)

    root = tmp_path / "rhd"
    write_synthetic_rhd(str(root), "evaluation", n=8, seed=11)
    ds = RHDDataset(str(root), "evaluation")
    raw = jax.device_put(ds.raw_batch(list(range(8))))

    cfg = TINY.replace(use_fake_data=False, input_img_shape=(128, 128),
                       input_channels=3, compute_dtype="float32")
    model = build_model(cfg)
    pp_kwargs = dict(crop_size=cfg.crop_size, sigma=cfg.sigma,
                     switch_joint_order=cfg.joint_order_switched)
    batch = preprocess_batch(raw, **pp_kwargs)
    inp = model_input(batch, cfg.input_channels)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)

    def mk_state(k):
        return create_train_state(model, cfg, args, jax.random.PRNGKey(k),
                                  10)

    rng = jax.random.PRNGKey(3)
    sep_state, sep_m = make_train_step(model, cfg)(mk_state(0), batch, rng)

    fused = make_fused_train_step(model, cfg, preprocess_batch, pp_kwargs)
    # the fused step splits its rng (aug, fwd); replicate that split so
    # the forward rng matches
    _, fwd_rng = jax.random.split(rng)
    sep_state2, sep_m2 = make_train_step(model, cfg)(mk_state(0), batch,
                                                     fwd_rng)
    fus_state, fus_m = fused(mk_state(0), raw, rng)
    np.testing.assert_allclose(float(fus_m["loss"]), float(sep_m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(fus_state.params),
                    jax.tree.leaves(sep_state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    ev_sep = make_eval_step(model, cfg)(mk_state(1), batch,
                                        jax.random.PRNGKey(4))
    ev_fus = make_fused_eval_step(model, cfg, preprocess_batch, pp_kwargs)(
        mk_state(1), raw, jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(ev_fus["mpjpe"]),
                               float(ev_sep["mpjpe"]), rtol=1e-5)


def test_worker_fused_real_data_train(tmp_path):
    """End-to-end: Worker with fuse_preprocess trains on an RHD tree."""
    from handpose_tpu.data.rhd import write_synthetic_rhd

    root = tmp_path / "rhd"
    write_synthetic_rhd(str(root), "evaluation", n=16, seed=13)
    cfg = TINY.replace(use_fake_data=False, dataset_name="RHD",
                       dataset_root_dir=str(root),
                       use_val_dataset_to_debug=True, batch_size=8,
                       input_channels=3, input_img_shape=(64, 64),
                       save_log_dir=str(tmp_path / "logs"))
    w = Worker(cfg)
    assert w.fused
    val = w.run_epoch(0, "validation")
    assert np.isfinite(val)
    w.run_epoch(0, "training")


def test_remat_step_matches_plain():
    """remat=True recomputes activations in backward; numerics identical."""
    cfg = TINY.replace(compute_dtype="float32")
    model = build_model(cfg)
    batch = fake_sample_batch(8, 64, 3, seed=0)
    inp = model_input(batch, 3)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)

    def run(remat):
        c = cfg.replace(remat=remat)
        state = create_train_state(model, c, args, jax.random.PRNGKey(0), 10)
        step = make_train_step(model, c)
        state, m = step(state, batch, jax.random.PRNGKey(1))
        return float(m["loss"]), jax.tree.leaves(state.params)

    l0, p0 = run(False)
    l1, p1 = run(True)
    assert l0 == l1
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_accum_grads_machinery_exact():
    """_accum_grads mechanics verified EXACTLY on a numerically benign
    toy grad_one: microbatch split order, per-microbatch rng routing,
    grad averaging, stats threading, and loss meaning all match a
    hand-rolled loop (a full BN model cannot pin these exactly: XLA
    fusion reassociates reductions, and 18 stacked BNs amplify that to
    ~0.4% -- the same measured chaos band NOTES_r3.md documents)."""
    from types import SimpleNamespace

    from handpose_tpu.train.steps import _accum_grads

    k, B = 4, 8
    data = jnp.arange(B * 3, dtype=jnp.float32).reshape(B, 3)
    params = {"w": jnp.array([0.5, -1.0, 2.0])}
    state = SimpleNamespace(params=params, batch_stats={"n": jnp.zeros(())})
    rng = jax.random.PRNGKey(7)

    def grad_one(p, bs, data_i, rng_i):
        target = jax.random.normal(rng_i, (3,))

        def loss_fn(q):
            return jnp.mean((data_i * q["w"] - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(p)
        return g, {"n": bs["n"] + 1}, {"loss": loss}

    grads, new_bs, losses = _accum_grads(grad_one, state, data, rng, k)

    # hand-rolled oracle: reshape split == contiguous slices, rng i =
    # split(rng, k)[i], mean of grads / losses, stats threaded k times
    rngs = jax.random.split(rng, k)
    gs, ls = [], []
    for i in range(k):
        gi, _, li = grad_one(params, {"n": jnp.zeros(())},
                             data[2 * i:2 * (i + 1)], rngs[i])
        gs.append(gi)
        ls.append(li["loss"])
    np.testing.assert_allclose(np.asarray(grads["w"]),
                               np.mean([g["w"] for g in gs], axis=0),
                               rtol=1e-6)
    np.testing.assert_allclose(float(losses["loss"]),
                               np.mean([float(l) for l in ls]), rtol=1e-6)
    assert float(new_bs["n"]) == k


def test_grad_accum_matches_manual_microbatch_mean():
    """grad_accum=2 == hand-rolled accumulation on the real model:
    per-microbatch grads (BN stats threaded through) averaged, ONE
    optax update.  Tolerances are the measured jit-vs-eager chaos band
    of this BN stack (~0.4% on the loss; the machinery itself is pinned
    exactly by test_accum_grads_machinery_exact).  BN running stats
    take momentum once per microbatch (the torch accumulation
    contract, steps.py::_accum_grads).
    """
    from handpose_tpu.train.steps import _forward, compute_losses

    cfg = TINY.replace(compute_dtype="float32", grad_accum=2)
    model = build_model(cfg)
    batch = fake_sample_batch(8, 64, 3, seed=2)
    inp = model_input(batch, 3)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    rng = jax.random.PRNGKey(1)

    def mk_state():
        return create_train_state(model, cfg, args, jax.random.PRNGKey(0),
                                  10)

    got, m = make_train_step(model, cfg)(mk_state(), batch, rng)

    # manual oracle: same split, same rng routing as _accum_grads
    state0 = mk_state()
    rngs = jax.random.split(rng, 2)
    bs, gsum, losses = state0.batch_stats, None, []

    def loss_fn(p, bs, mb, r):
        out, new_bs = _forward(model.apply, p, bs, mb, cfg, True, r)
        l = compute_losses(out, mb, cfg)
        return l["loss"], (new_bs, l)

    for i in range(2):
        mb = jax.tree.map(lambda a: a[4 * i:4 * (i + 1)], batch)
        (_, (bs, li)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state0.params, bs, mb, rngs[i])
        losses.append(li)
        gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
    grads = jax.tree.map(lambda x: x / 2, gsum)
    want = state0.apply_gradients(grads=grads).replace(batch_stats=bs)

    np.testing.assert_allclose(
        float(m["loss"]),
        (float(losses[0]["loss"]) + float(losses[1]["loss"])) / 2, rtol=2e-2)
    for a, b in zip(jax.tree.leaves(got.params), jax.tree.leaves(want.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    for a, b in zip(jax.tree.leaves(got.batch_stats),
                    jax.tree.leaves(want.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=1e-2)


def test_grad_accum_fused_step(tmp_path):
    """The fused (preprocess-inside-jit) step accumulates identically to
    per-microbatch fused steps (manual oracle: separate preprocess +
    grad per microbatch, same rng routing); indivisible batch raises."""
    from handpose_tpu.data.preprocess import preprocess_batch
    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
    from handpose_tpu.train.steps import (_forward, compute_losses,
                                          make_fused_train_step)

    root = tmp_path / "rhd"
    write_synthetic_rhd(str(root), "evaluation", n=8, seed=13)
    ds = RHDDataset(str(root), "evaluation")
    raw = jax.device_put(ds.raw_batch(list(range(8))))

    cfg = TINY.replace(use_fake_data=False, input_img_shape=(128, 128),
                       compute_dtype="float32", grad_accum=2)
    model = build_model(cfg)
    pp_kwargs = dict(crop_size=cfg.crop_size, sigma=cfg.sigma,
                     switch_joint_order=cfg.joint_order_switched)
    batch = preprocess_batch(raw, **pp_kwargs)
    inp = model_input(batch, cfg.input_channels)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    rng = jax.random.PRNGKey(1)

    def mk_state():
        return create_train_state(model, cfg, args, jax.random.PRNGKey(0),
                                  10)

    step = make_fused_train_step(model, cfg, preprocess_batch, pp_kwargs)
    got, m = step(mk_state(), raw, rng)

    state0 = mk_state()
    rngs = jax.random.split(rng, 2)
    bs, gsum = state0.batch_stats, None

    def loss_fn(p, bs, mb, r):
        out, new_bs = _forward(model.apply, p, bs, mb, cfg, True, r)
        l = compute_losses(out, mb, cfg)
        return l["loss"], new_bs

    for i in range(2):
        raw_i = jax.tree.map(lambda a: a[4 * i:4 * (i + 1)], raw)
        _, fwd_rng = jax.random.split(rngs[i])   # grad_one's aug/fwd split
        mb = preprocess_batch(raw_i, **pp_kwargs)
        (_, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state0.params, bs, mb, fwd_rng)
        gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
    grads = jax.tree.map(lambda x: x / 2, gsum)
    want = state0.apply_gradients(grads=grads).replace(batch_stats=bs)

    # measured jit-vs-eager chaos band of the BN stack (~0.4% on loss);
    # exact machinery is pinned by test_accum_grads_machinery_exact
    for a, b in zip(jax.tree.leaves(got.params), jax.tree.leaves(want.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)

    with pytest.raises(ValueError, match="grad_accum=3 does not divide"):
        bad = make_fused_train_step(model, cfg.replace(grad_accum=3),
                                    preprocess_batch, pp_kwargs)
        bad(mk_state(), raw, rng)


def test_grad_accum_eval_step_matches_single_shot():
    """Eval accumulation (steps.py::_accum_eval): grad_accum=2 metrics ==
    single-shot (eval-mode BN uses running averages, so microbatching
    cannot change the math beyond reassociation ulps); _sum/_count keys
    add exactly.  An indivisible tail (b6 under grad_accum=4) degrades
    to gcd=2 and still runs."""
    cfg = TINY.replace(compute_dtype="float32")
    model = build_model(cfg)
    batch = fake_sample_batch(8, 64, 3, seed=4)
    inp = model_input(batch, 3)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    rng = jax.random.PRNGKey(1)
    thresholds = (0.02, 0.05)

    m1 = make_eval_step(model, cfg, thresholds)(state, batch, rng)
    m2 = make_eval_step(model, cfg.replace(grad_accum=2), thresholds)(
        state, batch, rng)
    assert set(m1) == set(m2)
    for key in m1:
        np.testing.assert_allclose(np.asarray(m2[key]), np.asarray(m1[key]),
                                   rtol=1e-4, err_msg=key)

    tail = jax.tree.map(lambda a: a[:6], batch)
    m3 = make_eval_step(model, cfg.replace(grad_accum=4), thresholds)(
        state, tail, rng)      # gcd(4, 6) = 2 microbatches of 3
    assert np.isfinite(float(m3["mpjpe"]))


def test_preemption_checkpoint_and_resume(tmp_path):
    """Preemption-safe training (SURVEY.md §5: the reference has no
    failure/recovery mechanism): a SIGTERM-style signal stops the loop at
    the next step boundary, run() writes a checkpoint pinned to the
    INTERRUPTED epoch, and resuming restarts that epoch with the exact
    post-preemption parameters."""
    import signal

    from handpose_tpu.train import PreemptionGuard

    cfg = TINY.replace(save_log_dir=str(tmp_path), max_epoch=5)
    w = Worker(cfg)
    guard = w.enable_preemption_save(
        PreemptionGuard(signals=(signal.SIGUSR1,)))
    try:
        # deliver the signal from inside step 12 (2 steps into epoch 1,
        # at 10 fake-data steps/epoch): the NEXT iteration boundary must
        # notice it
        counter = {"n": 0}
        orig = w.train_step

        def counting_step(state, batch, rng):
            counter["n"] += 1
            if counter["n"] == 12:
                os.kill(os.getpid(), signal.SIGUSR1)
            return orig(state, batch, rng)

        w.train_step = counting_step
        w.run()

        assert guard.requested
        assert counter["n"] == 12          # boundary check fires before 13
        ckpt = os.path.join(w.run_dir, "checkpoint")
        assert os.path.isdir(ckpt)

        # resume restarts the interrupted epoch with the preempted params
        # (NOT epoch 0's end-of-epoch save, which the preemption save
        # must have overwritten)
        w2 = Worker(cfg.replace(resume_weight_path=ckpt))
        assert w2.start_epoch == 1
        for a, b in zip(jax.tree.leaves(w.state.params),
                        jax.tree.leaves(w2.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        guard.uninstall()

    # --- preemption DURING VALIDATION must not poison best_mpjpe ---
    # (a partial validation MPJPE is biased; 0 batches would read as 0.0
    # == "perfect" and freeze checkpoint_best forever)
    g2 = w2.enable_preemption_save(
        PreemptionGuard(signals=(signal.SIGUSR2,)))
    try:
        best_before = w2.best_mpjpe
        assert np.isfinite(best_before)
        orig_eval = w2.eval_step

        def requesting_eval(state, batch, rng):
            g2.request()               # cooperative trigger, same flag
            return orig_eval(state, batch, rng)

        w2.eval_step = requesting_eval
        ret = w2.run()
        assert ret == best_before      # partial validation ignored
        from handpose_tpu.train import load_raw
        saved = load_raw(os.path.join(w2.run_dir, "checkpoint"))
        # training for the epoch completed -> resume continues AFTER it
        assert int(saved["epoch"]) == w2.start_epoch + 1
        assert float(saved["best_mpjpe"]) == np.float32(best_before)
    finally:
        g2.uninstall()


def test_preemption_guard_restores_non_python_handler():
    """uninstall() must not raise when the pre-existing handler was not
    installed from Python (signal.getsignal returns None for handlers set
    by C extensions/embedders)."""
    import signal

    from handpose_tpu.train import PreemptionGuard

    g = PreemptionGuard(signals=(signal.SIGUSR1,))
    g.install()
    g._previous[signal.SIGUSR1] = None    # as if set by a C embedder
    g.uninstall()                         # must not raise
    assert signal.getsignal(signal.SIGUSR1) == signal.SIG_DFL


def test_validation_with_no_batches_yields_no_metric(tmp_path):
    """run_epoch('validation') that sees zero batches returns None, not a
    fake-perfect 0.0 MPJPE."""
    import types

    cfg = TINY.replace(save_log_dir=str(tmp_path))
    w = Worker(cfg)

    def empty(self, split, seed):
        return iter(())

    w._epoch_batches = types.MethodType(empty, w)
    assert w.run_epoch(0, "validation") is None


def test_worker_validation_includes_tail_batch(tmp_path):
    """Validation iterates the WHOLE split (reference drop_last=False):
    the tail partial batch is evaluated; training keeps fixed shapes."""
    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd

    write_synthetic_rhd(str(tmp_path), "evaluation", 16)
    ds = RHDDataset(str(tmp_path), "evaluation")
    w = object.__new__(Worker)       # duck-typed: no step compilation
    w.cfg = TINY.replace(batch_size=6, use_fake_data=False,
                         dataset_name="RHD")
    w.train_ds = ds
    w.val_ds = ds
    w.fused = True
    train = list(w._epoch_batches("training", 0))
    val = list(w._epoch_batches("validation", 0))
    assert [b.image.shape[0] for b in train] == [6, 6]
    assert [b.image.shape[0] for b in val] == [6, 6, 4]


def test_filtered_resume_preserves_sharding(tmp_path):
    """Resume must keep the mesh layout the Worker set up (a bare asarray
    rebuild would feed host-local arrays into the global SPMD step)."""
    from jax.sharding import NamedSharding

    cfg = TINY
    model = build_model(cfg)
    batch = fake_sample_batch(4, 64, 3, seed=0)
    inp = model_input(batch, 3)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(4, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    save_checkpoint(str(tmp_path), state, epoch=3, best_mpjpe=9.0,
                    is_best=False)

    mesh = make_mesh(shape=(8,))
    state2 = create_train_state(model, cfg, args, jax.random.PRNGKey(5), 10)
    state2 = state2.replace(params=replicate(state2.params, mesh),
                            batch_stats=replicate(state2.batch_stats, mesh),
                            opt_state=replicate(state2.opt_state, mesh))
    state2, epoch, best, finetune = filtered_resume(
        state2, str(tmp_path / "checkpoint"))
    assert not finetune and epoch == 3
    for leaf in jax.tree.leaves(state2.params):
        assert isinstance(leaf.sharding, NamedSharding)
        assert leaf.sharding.mesh == mesh
    # values came from the checkpoint
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reconcile_schedule_count_resumes_lr_at_epoch():
    """A checkpoint written by a run with a DIFFERENT steps_per_epoch
    (migrated torch run, changed batch size, mid-epoch preemption) must
    resume the cosine LR at start_epoch -- not wherever the foreign
    count // steps_per_epoch lands (possibly clamped to eta_min).
    Adam's bias-correction count keeps the true step count."""
    import jax
    import jax.numpy as jnp
    import optax

    from handpose_tpu.train.checkpoints import reconcile_schedule_count
    from handpose_tpu.train.state import (TrainState, cosine_epoch_schedule,
                                          make_optimizer)

    spe, start_epoch, max_epoch = 5, 7, 60
    tx = make_optimizer(1e-4, 1e-5, max_epoch, spe)
    params = {"w": jnp.ones((3,))}
    state = TrainState.create(apply_fn=lambda *a: None, params=params,
                              tx=tx)
    # simulate a restored foreign optimizer: 9100 steps taken in a run
    # with ~1300 steps/epoch -> 9100 // 5 = epoch 1820 -> LR = eta_min
    foreign = jnp.asarray(9100, jnp.int32)
    adam = state.opt_state[0]._replace(count=foreign)
    sched = state.opt_state[1]._replace(count=foreign)
    state = state.replace(opt_state=(adam, sched)
                          + tuple(state.opt_state[2:]))

    state = reconcile_schedule_count(state, start_epoch, spe)
    assert int(state.opt_state[0].count) == 9100   # Adam bias correction
    assert int(state.opt_state[1].count) == start_epoch * spe
    # the very next update trains at the epoch-7 cosine LR
    lr = cosine_epoch_schedule(1e-4, 1e-5, max_epoch, spe)(
        state.opt_state[1].count)
    expect = 1e-5 + (1e-4 - 1e-5) * (1 + np.cos(
        np.pi * start_epoch / max_epoch)) / 2
    assert float(lr) == pytest.approx(expect, rel=1e-6)
    # and an actual optax update scales by it (not by eta_min): with
    # fresh moments at large count the bias corrections are ~1, so the
    # constant-grad Adam direction is (1-b1)/sqrt(1-b2) = 3.1623
    grads = {"w": jnp.ones((3,))}
    updates, _ = state.tx.update(grads, state.opt_state, state.params)
    adam_dir = (1 - 0.9) / np.sqrt(1 - 0.999)
    assert float(jnp.abs(updates["w"][0])) == pytest.approx(
        expect * adam_dir, rel=0.05)


def test_apply_overrides_typed_tuples():
    from handpose_tpu.config import apply_overrides

    c = apply_overrides(TINY, ["mesh_axis_names=data,model",
                               "mesh_shape=4,2", "sigma=20",
                               "remat=true"])
    assert c.mesh_axis_names == ("data", "model")
    assert c.mesh_shape == (4, 2)
    assert c.sigma == 20.0 and c.remat is True
    with pytest.raises(SystemExit):
        apply_overrides(TINY, ["not_a_field=1"])


def test_config_json_roundtrip():
    """to_json -> from_json restores the exact Config (incl. tuple fields
    arriving back as tuples, not JSON lists) -- the run dir's config.json
    provenance snapshot is programmatically reloadable (--from_run)."""
    from handpose_tpu.config import Config

    assert hasattr(Config, "from_json")
    cfg = TINY.replace(mesh_shape=(4, 2), mesh_axis_names=("data", "model"),
                       sigma=12.5, remat=True,
                       scale_target_size=(120, 160))
    back = Config.from_json(cfg.to_json())
    assert back == cfg
    # unknown keys (older/newer snapshots) are ignored, not fatal
    import json
    raw = json.loads(cfg.to_json())
    raw["some_future_field"] = 42
    assert Config.from_json(json.dumps(raw)) == cfg


def test_trainval_from_run_cli(tmp_path, monkeypatch, capsys):
    """`trainval.py --from_run <dir>` rehydrates the run's config.json
    and trains with it (end-to-end through the CLI's main())."""
    import runpy
    import sys

    cfg = TINY.replace(save_log_dir=str(tmp_path / "logs"), max_epoch=1,
                       dataset_name="synthetic")
    run = tmp_path / "run_x"
    run.mkdir()
    (run / "config.json").write_text(cfg.to_json())
    monkeypatch.setattr(sys, "argv", [
        "trainval.py", "--from_run", str(run), "--fast_debug",
        "--set", "log_every_steps=0"])
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                "trainval.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "best val MPJPE:" in out


def test_preempt_now_multihost_agreement(tmp_path, monkeypatch):
    """The cross-host agreement path: with >1 process the local flag is
    all-gathered and ANY host's request stops every host (a skewed
    SIGTERM must not deadlock the collective step).  The collective is
    stubbed -- a single process cannot host a real 2-process gather."""
    import numpy as np
    from jax.experimental import multihost_utils

    from handpose_tpu.train import PreemptionGuard

    w = object.__new__(Worker)        # no compilation needed
    w.preempt = None
    assert Worker._preempt_now(w) is False

    w.preempt = PreemptionGuard(signals=())
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    peer = {"requested": False}

    def fake_allgather(x):
        return np.array([bool(x), peer["requested"]])

    monkeypatch.setattr(multihost_utils, "process_allgather",
                        fake_allgather)
    assert Worker._preempt_now(w) is False     # nobody requested
    peer["requested"] = True
    assert Worker._preempt_now(w) is True      # PEER requested -> stop
    peer["requested"] = False
    w.preempt.request()
    assert Worker._preempt_now(w) is True      # local request -> stop


def test_multi_step_matches_sequential_single_steps(tmp_path):
    """make_fused_multi_step(k) == k sequential make_fused_train_step
    calls with the same derived per-step rngs (identical preprocessing,
    grads, Adam updates and batch-stats chaining)."""
    from handpose_tpu.data.preprocess import preprocess_batch
    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
    from handpose_tpu.train.steps import (make_fused_multi_step,
                                          make_fused_train_step)

    root = tmp_path / "rhd"
    write_synthetic_rhd(str(root), "evaluation", n=16, seed=21)
    ds = RHDDataset(str(root), "evaluation")
    raw0 = jax.device_put(ds.raw_batch(list(range(8))))
    raw1 = jax.device_put(ds.raw_batch(list(range(8, 16))))

    cfg = TINY.replace(use_fake_data=False, input_img_shape=(128, 128),
                       input_channels=3, compute_dtype="float32",
                       steps_per_dispatch=2)
    model = build_model(cfg)
    pp_kwargs = dict(crop_size=cfg.crop_size, sigma=cfg.sigma,
                     switch_joint_order=cfg.joint_order_switched)
    batch = preprocess_batch(raw0, **pp_kwargs)
    inp = model_input(batch, cfg.input_channels)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)

    def mk_state(k):
        return create_train_state(model, cfg, args, jax.random.PRNGKey(k),
                                  10)

    rng = jax.random.PRNGKey(7)
    single = make_fused_train_step(model, cfg, preprocess_batch, pp_kwargs)
    rngs = jax.random.split(rng, 2)
    st = mk_state(0)
    st, m0 = single(st, raw0, rngs[0])
    st, m1 = single(st, raw1, rngs[1])

    multi = make_fused_multi_step(model, cfg, preprocess_batch, pp_kwargs)
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), raw0, raw1)
    st_m, mk = multi(mk_state(0), stack, rng)

    # Scan-vs-standalone: XLA fuses/reassociates differently inside
    # lax.scan, so step 1's loss matches to f32 ulps, step 2's to ~1e-5
    # relative, and the 2-step params to ~1e-4 (Adam's g/sqrt(v)
    # rescaling amplifies the rounding).  A semantic bug (wrong rng
    # split, batch order, dropped update) is orders of magnitude above
    # these bands; the k=1 check below pins the program itself tightly.
    np.testing.assert_allclose(np.asarray(mk["loss"]),
                               [float(m0["loss"]), float(m1["loss"])],
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(st_m.params), jax.tree.leaves(st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)
    for a, b in zip(jax.tree.leaves(st_m.batch_stats),
                    jax.tree.leaves(st.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)

    # k=1 multi-step == the single fused step: same math modulo one
    # scan wrapper.  Loss matches to 1e-6; params match except for an
    # O(1)-count tail of elements where Adam's g/sqrt(v) rescaling
    # amplifies reassociation-level grad differences (1/589824 measured
    # at 7.6e-5) -- atol 5e-4 bounds that tail while staying orders
    # below any semantic difference (wrong rng/batch => O(1e-2) global).
    multi1 = make_fused_multi_step(model, cfg.replace(steps_per_dispatch=1),
                                   preprocess_batch, pp_kwargs)
    stack1 = jax.tree.map(lambda a: a[None], raw0)
    rng1 = jax.random.split(jax.random.PRNGKey(9), 1)[0]
    st_s, m_s = single(mk_state(2), raw0, rng1)
    st_1, m_1 = multi1(mk_state(2), stack1, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(m_1["loss"][0]), float(m_s["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(st_1.params), jax.tree.leaves(st_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    assert int(st_m.step) == int(st.step) == 2


def test_worker_multi_step_dispatch(tmp_path):
    """Worker with steps_per_dispatch=2: groups dispatch through the
    scanned program, the odd epoch tail runs the single-step program,
    and every step is still logged/accumulated (n == steps)."""
    from handpose_tpu.data.rhd import write_synthetic_rhd

    root = tmp_path / "rhd"
    write_synthetic_rhd(str(root), "evaluation", n=24, seed=22)
    cfg = TINY.replace(use_fake_data=False, dataset_name="RHD",
                       dataset_root_dir=str(root),
                       use_val_dataset_to_debug=True, batch_size=8,
                       input_channels=3, input_img_shape=(64, 64),
                       steps_per_dispatch=2,
                       save_log_dir=str(tmp_path / "logs"))
    w = Worker(cfg)
    assert w.fused and w.multi_step is not None
    w.run_epoch(0, "training")        # 3 steps: one group of 2 + tail 1
    assert int(w.state.step) == 3
    val = w.run_epoch(0, "validation")
    assert np.isfinite(val)


def test_multi_step_requires_fused():
    import pytest as _pytest
    cfg = TINY.replace(fuse_preprocess=False, steps_per_dispatch=4)
    with _pytest.raises(ValueError, match="steps_per_dispatch"):
        Worker(cfg)
