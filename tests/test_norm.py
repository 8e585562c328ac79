"""BatchNorm variance modes (nn/norm.py).

'shifted' must combine the fast path's one-pass structure with the
stable path's numerics: mathematically identical batch variance (shift
identity), running-stat updates matching flax BatchNorm, robustness in
the |mean| >> std regime once the running mean has warmed up, and
partition-invariant sharded training from a warmed state.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.nn.norm import BN_MODES, ShiftedBatchNorm, make_norm


def _flax_bn(fast):
    return nn.BatchNorm(use_running_average=False, momentum=0.9,
                        epsilon=1e-5, use_fast_variance=fast)


def _apply(mod, variables, x):
    return mod.apply(variables, x, mutable=["batch_stats"])


def test_shifted_matches_stable_train_and_stats():
    """Same inputs + same (non-trivial) running stats -> same outputs and
    same updated running stats as the two-pass flax BatchNorm."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, (8, 6, 6, 16)).astype(np.float32))
    variables = {
        "params": {"scale": jnp.asarray(rng.uniform(0.5, 2, 16),
                                        jnp.float32),
                   "bias": jnp.asarray(rng.normal(size=16), jnp.float32)},
        "batch_stats": {"mean": jnp.asarray(rng.normal(size=16),
                                            jnp.float32),
                        "var": jnp.asarray(rng.uniform(0.5, 2, 16),
                                           jnp.float32)},
    }
    y_ref, st_ref = _apply(_flax_bn(fast=False), variables, x)
    y, st = _apply(ShiftedBatchNorm(use_running_average=False), variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(st["batch_stats"][k]),
                                   np.asarray(st_ref["batch_stats"][k]),
                                   rtol=1e-5, atol=1e-6)


def test_shifted_eval_matches_flax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 5, 5, 8)).astype(np.float32))
    variables = {
        "params": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        "batch_stats": {"mean": jnp.asarray(rng.normal(size=8), jnp.float32),
                        "var": jnp.asarray(rng.uniform(0.5, 2, 8),
                                           jnp.float32)},
    }
    y_ref = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5).apply(variables, x)
    y = ShiftedBatchNorm(use_running_average=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)


def test_shifted_survives_large_mean_where_fast_cancels():
    """|mean| >> std is the fast form's catastrophic-cancellation regime
    (round-2 finding).  With a warmed running mean, the shifted form
    recovers the true variance like the two-pass form; flax's fast form
    visibly does not."""
    rng = np.random.default_rng(2)
    true_std = 1e-2
    x = jnp.asarray((4000.0 + rng.normal(0, true_std, (16, 8, 8, 4)))
                    .astype(np.float32))
    variables = {
        "params": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
        "batch_stats": {"mean": jnp.full((4,), 4000.0, jnp.float32),
                        "var": jnp.ones(4, jnp.float32)},
    }
    _, st_stable = _apply(_flax_bn(fast=False), variables, x)
    _, st_fast = _apply(_flax_bn(fast=True), variables, x)
    _, st_shift = _apply(ShiftedBatchNorm(use_running_average=False),
                         variables, x)
    v_stable = np.asarray(st_stable["batch_stats"]["var"])
    v_fast = np.asarray(st_fast["batch_stats"]["var"])
    v_shift = np.asarray(st_shift["batch_stats"]["var"])
    np.testing.assert_allclose(v_shift, v_stable, rtol=1e-3)
    # the fast form's variance is dominated by float32 round-off of
    # E[x^2] ~ 1.6e7 (eps ~ 1-2), i.e. orders of magnitude off
    assert np.max(np.abs(v_fast - v_stable) / v_stable) > 10 * \
        np.max(np.abs(v_shift - v_stable) / v_stable)


def test_make_norm_modes():
    for mode in BN_MODES:
        make_norm(mode, train=True, dtype=jnp.float32)
    with pytest.raises(ValueError):
        make_norm("bogus", True, jnp.float32)


def test_shifted_partition_invariant_after_warmup():
    """The headline property: from a WARMED running mean, a tp-sharded
    train step with bn_variance='shifted' matches the replicated step as
    tightly as 'stable' does (the fast form drifts here)."""
    from handpose_tpu.models import build_model
    from handpose_tpu.parallel.sharding import (make_dp_tp_mesh,
                                                shard_train_state)
    from handpose_tpu.parallel.mesh import shard_batch
    from handpose_tpu.train.steps import make_train_step
    from handpose_tpu.train.state import create_train_state
    from handpose_tpu.config import Config
    from handpose_tpu.data.synthetic import fake_sample_batch
    from handpose_tpu.data.preprocess import model_input

    assert len(jax.devices()) == 8
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 batch_size=8, input_img_shape=(32, 32),
                 resnet_out_feature_dim=64, compute_dtype="float32",
                 bn_variance="shifted")
    model = build_model(cfg)
    batch = fake_sample_batch(8, 32, 3, seed=0)
    # constant-ish images are exactly the cancellation-amplifying case
    batch["image_crop"] = jnp.full_like(batch["image_crop"], 0.37)
    inp = model_input(batch, 3)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 4)
    step = make_train_step(model, cfg)

    # warm the running stats on the replicated path
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(10 + i))

    mesh = make_dp_tp_mesh(8)
    # deep-copy before sharding: the step donates its state argument, and
    # device_put may alias the device-0 shard of the replicated layout
    state_copy = jax.tree.map(lambda a: jnp.array(a, copy=True), state)
    sharded = shard_train_state(state_copy, mesh)
    _, m_sharded = step(sharded, shard_batch(batch, mesh),
                        jax.random.PRNGKey(1))
    _, m_rep = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_sharded["loss"]),
                               float(m_rep["loss"]), rtol=1e-3)

def test_pallas_moments_matches_jnp():
    """fused_shifted_moments (the one-HBM-pass TPU kernel, run here in
    interpret mode) must match the jnp shifted-moment computation in
    values AND gradients, f32 and bf16, even N-divisible and tail-padded
    row counts."""
    from handpose_tpu.ops.pallas_kernels import fused_shifted_moments

    rng = np.random.default_rng(3)
    for N, C, dt in [(64, 8, jnp.float32), (100, 16, jnp.float32),
                     (1030, 64, jnp.float32), (96, 24, jnp.bfloat16)]:
        x = jnp.asarray(rng.normal(2.0, 1.5, (N, C)), dt)
        shift = jnp.asarray(rng.normal(0.0, 1.0, C), jnp.float32)

        s_p, ss_p = fused_shifted_moments(x, shift, True)
        d = x.astype(jnp.float32) - shift[None, :]
        s_j, ss_j = jnp.sum(d, 0), jnp.sum(d * d, 0)
        np.testing.assert_allclose(s_p, s_j, rtol=2e-5, atol=2e-3)
        np.testing.assert_allclose(ss_p, ss_j, rtol=2e-5, atol=2e-2)

        # gradients: weighted sum of both outputs, d/dx and d/dshift
        w1 = jnp.asarray(rng.normal(size=C), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=C), jnp.float32)

        def loss_p(x_, sh_):
            a, b = fused_shifted_moments(x_, sh_, True)
            return jnp.sum(a * w1) + jnp.sum(b * w2)

        def loss_j(x_, sh_):
            dd = x_.astype(jnp.float32) - sh_[None, :]
            return (jnp.sum(jnp.sum(dd, 0) * w1) +
                    jnp.sum(jnp.sum(dd * dd, 0) * w2))

        gx_p, gs_p = jax.grad(loss_p, argnums=(0, 1))(x, shift)
        gx_j, gs_j = jax.grad(loss_j, argnums=(0, 1))(x, shift)
        atol = 5e-2 if dt == jnp.bfloat16 else 1e-4
        np.testing.assert_allclose(np.asarray(gx_p, np.float32),
                                   np.asarray(gx_j, np.float32),
                                   rtol=1e-2, atol=atol)
        np.testing.assert_allclose(gs_p, gs_j, rtol=2e-5, atol=2e-3)


def test_shifted_bn_pallas_impl_matches_jnp():
    """ShiftedBatchNorm(moments='pallas') == moments='jnp' end to end
    (interpret mode; the TPU A/B decides speed, this pins semantics)."""
    from handpose_tpu.nn.norm import ShiftedBatchNorm

    x = jnp.asarray(np.random.default_rng(0).normal(1.0, 2.0, (4, 6, 6, 8)),
                    jnp.float32)
    outs, vars_out = [], []
    for moments in ("jnp", "pallas"):
        bn = ShiftedBatchNorm(use_running_average=False, moments=moments)
        variables = bn.init(jax.random.PRNGKey(0), x)
        y, mut = bn.apply(variables, x, mutable=["batch_stats"])
        outs.append(np.asarray(y))
        vars_out.append(jax.tree.map(np.asarray, mut))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-5, atol=1e-6), vars_out[0], vars_out[1])

