"""Jitted train / eval steps with per-model loss gating.

TPU-native equivalent of the per-iteration bodies of both reference
trainers (trainval.py:270-371, trainval_hand3DPose.py:230-320): one fused
forward+loss+backward+update XLA program.  Loss-term gating per model and
the uv/1e5 scaling (trainval.py:346) follow the reference's aggregation.

Data parallelism: the step functions are plain jit; feed them batch-sharded
arrays (parallel.mesh.shard_batch) and replicated state and XLA emits the
gradient all-reduce over the mesh -- the same compiled fn runs single-chip
or across a slice.
"""

from __future__ import annotations

import math

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.preprocess import model_input
from ..losses import LossCalculation, masked_l2_loss, rot_mat_mse
from ..metrics import masked_sum_count, mpjpe, pck_sum_count
from .state import TrainState

_TRAINER_B = ("Hand3DPoseNet", "Hand3DPosePriorNetwork")


def _train_jit(fn, cfg: Config):
    """jit for the train-step family: donated state + the measured
    scoped-VMEM compiler budget (``cfg.scoped_vmem_limit_kib``, +4.9%
    on v5e -- see config.py).  TPU only: other backends reject the
    TPU-specific option.  Forward/eval programs use plain jit."""
    opts = None
    if cfg.scoped_vmem_limit_kib and jax.default_backend() == "tpu":
        opts = {"xla_tpu_scoped_vmem_limit_kib":
                str(int(cfg.scoped_vmem_limit_kib))}
    return jax.jit(fn, donate_argnums=(0,), compiler_options=opts)


def _forward(model_apply, params, batch_stats, batch, cfg: Config,
             train: bool, rng):
    inp = model_input(batch, cfg.input_channels)
    B = inp.shape[0]
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(B, 1, -1)
    variables = {"params": params, "batch_stats": batch_stats}
    # batch keys prefixed ``_inject_`` become model kwargs: the parity
    # injection surface (e.g. _inject_init_noise / _inject_diff_t /
    # _inject_diff_noise pin M5's stochastic draws for lockstep
    # twin-training vs the torch reference; also deterministic serving)
    inject = {k[len("_inject_"):]: v for k, v in batch.items()
              if k.startswith("_inject_")}
    kwargs = dict(train=train, rngs={"diffusion": rng}, **inject)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    if train:
        out, new_state = model_apply(variables, *args,
                                     mutable=["batch_stats"], **kwargs)
        return out, new_state.get("batch_stats", batch_stats)
    out = model_apply(variables, *args, **kwargs)
    return out, batch_stats


def compute_losses(out, batch, cfg: Config) -> Dict[str, jnp.ndarray]:
    """Gated loss terms + total (reference trainval.py:330-360).

    The per-term math lives in ONE criterion object
    (:class:`handpose_tpu.losses.LossCalculation`, reference loss.py:62-153,
    constructed per the loss gates the same way trainval.py:115-117 does);
    this function only does the trainer's aggregation -- the uv/1e5 scaling
    (trainval.py:346) and adding the model-produced diffusion loss.
    """
    gates = cfg.loss_gates
    vis = batch["keypoint_vis21"]
    terms = {}
    total = jnp.zeros(())
    if cfg.model_name in _TRAINER_B:
        # trainer-B: canonical-coords L2 + rotation MSE
        # (reference trainval_hand3DPose.py:284-288)
        loss_xyz = masked_l2_loss(out.can_xyz,
                                  batch["kp_coord_xyz21_rel_can"], vis)
        loss_rot = rot_mat_mse(out.rot_mat, batch["rot_mat"])
        terms["loss_xyz"] = loss_xyz
        terms["loss_rot"] = loss_rot
        return {**terms, "loss": loss_xyz + loss_rot}
    criterion = LossCalculation(
        loss_type="L2",
        comp_xyz_loss=gates["xyz"] and out.xyz is not None,
        comp_uv_loss=gates["uv"] and out.uv is not None,
        comp_hand_mask_loss=gates["hand_mask"] and out.uv is not None,
        comp_regularization_loss=(gates["regularization"]
                                  and out.theta is not None))
    lt = criterion(out.xyz, batch["keypoint_xyz21"], out.uv,
                   batch["keypoint_uv21"], vis,
                   hand_mask=batch.get("right_hand_mask"),
                   theta=out.theta, beta=out.beta)
    if lt.xyz is not None:
        terms["loss_xyz"] = lt.xyz
        total = total + lt.xyz
    if lt.uv is not None:
        terms["loss_uv"] = lt.uv
        total = total + lt.uv / 1e5
    if gates["diffusion"] and out.diffusion_loss is not None:
        terms["loss_diffusion"] = out.diffusion_loss
        total = total + out.diffusion_loss
    if lt.hand_mask is not None:
        terms["loss_hand_mask"] = lt.hand_mask
        total = total + lt.hand_mask
    if lt.regularization is not None:
        terms["loss_regularization"] = lt.regularization
        total = total + lt.regularization
    return {**terms, "loss": total}


def _maybe_remat(model, cfg: Config):
    """Forward closure, optionally rematerialised.

    ``cfg.remat=True`` wraps the model forward in ``jax.checkpoint`` so the
    backward pass recomputes activations instead of keeping them in HBM --
    the standard FLOPs-for-memory trade for large-batch training.
    """
    def forward(params, batch_stats, batch, rng):
        return _forward(model.apply, params, batch_stats, batch, cfg, True,
                        rng)

    return jax.checkpoint(forward) if cfg.remat else forward


def _accum_grads(grad_one, state: TrainState, data, rng, k: int):
    """Gradient over ``data``, optionally accumulated over ``k``
    sequential microbatches (``cfg.grad_accum``).

    ``grad_one(params, batch_stats, data_i, rng_i) -> (grads, new_bs,
    losses)`` computes one microbatch's mean-loss gradient.  For ``k==1``
    it runs directly (the byte-identical single-shot program).  For
    ``k>1`` every leading axis of ``data`` is reshaped to
    ``(k, B//k, ...)`` and a ``lax.scan`` accumulates the grad sum --
    activations (and, in the fused step, the rendered scoremaps) live
    only for one microbatch at a time, so batches far past single-shot
    HBM limits train.  Returned grads are the mean over microbatches
    (== the full-batch gradient when per-microbatch masked-mean weights
    agree, e.g. equal visible-joint counts; the usual torch-style
    accumulation contract otherwise).  BatchNorm normalises per
    microbatch and running stats take momentum once per microbatch --
    also the torch accumulation semantics.  Loss metrics are microbatch
    means."""
    if k == 1:
        return grad_one(state.params, state.batch_stats, data, rng)

    def split(x):
        if x.shape[0] % k:
            raise ValueError(
                f"grad_accum={k} does not divide batch dim {x.shape[0]}")
        return x.reshape((k, x.shape[0] // k) + x.shape[1:])

    micro = jax.tree.map(split, data)
    rngs = jax.random.split(rng, k)
    grad_zero = jax.tree.map(jnp.zeros_like, state.params)

    def body(carry, xs):
        bs, gsum = carry
        data_i, rng_i = xs
        grads, new_bs, losses = grad_one(state.params, bs, data_i, rng_i)
        gsum = jax.tree.map(jnp.add, gsum, grads)
        return (new_bs, gsum), losses

    (new_bs, gsum), losses_k = jax.lax.scan(
        body, (state.batch_stats, grad_zero), (micro, rngs))
    grads = jax.tree.map(lambda g: g / k, gsum)
    losses = jax.tree.map(lambda x: jnp.mean(x, axis=0), losses_k)
    return grads, new_bs, losses


def make_train_step(model, cfg: Config):
    forward = _maybe_remat(model, cfg)

    def grad_one(params, batch_stats, batch, rng):
        def loss_fn(p):
            out, new_bs = forward(p, batch_stats, batch, rng)
            losses = compute_losses(out, batch, cfg)
            return losses["loss"], (new_bs, losses)

        (_, (new_bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, new_bs, losses

    # donate the state: params/opt buffers are updated in place on device,
    # halving peak HBM for the update step
    def train_step(state: TrainState, batch, rng):
        grads, new_bs, losses = _accum_grads(grad_one, state, batch, rng,
                                             cfg.grad_accum)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_bs)
        return state, losses

    return _train_jit(train_step, cfg)


def _eval_metrics(out, batch, cfg: Config, pck_thresholds=None):
    losses = compute_losses(out, batch, cfg)
    vis = batch["keypoint_vis21"]
    if cfg.model_name in _TRAINER_B:
        m = mpjpe(out.can_xyz, batch["kp_coord_xyz21_rel_can"], vis)
        s, n = masked_sum_count(out.can_xyz,
                                batch["kp_coord_xyz21_rel_can"], vis)
    elif cfg.model_name == "TwoDimHandPose":
        m = mpjpe(out.uv, batch["keypoint_uv21"], vis)
        s, n = masked_sum_count(out.uv, batch["keypoint_uv21"], vis)
    else:
        m = mpjpe(out.xyz, batch["keypoint_xyz21"], vis)
        s, n = masked_sum_count(out.xyz, batch["keypoint_xyz21"], vis)
    metrics = {**losses, "mpjpe": m, "mpjpe_sum": s, "mpjpe_count": n}
    if pck_thresholds is not None and out.xyz is not None:
        # PCK sums ride the same program as MPJPE: one forward per batch
        # instead of evaluate_full's former second (unfused) pass
        cs, cn = pck_sum_count(out.xyz, batch["keypoint_xyz21"], vis,
                               pck_thresholds)
        metrics["pck_correct_sum"] = cs
        metrics["pck_count"] = cn
    return metrics


def _accum_eval(metrics_one, data, rng, k: int):
    """Eval metrics over ``data``, microbatched like :func:`_accum_grads`
    (``cfg.grad_accum``) so validation survives the same batch sizes the
    accumulated train step does.  ``_sum``/``_count`` keys add across
    microbatches (the Worker's exact epoch aggregation path); per-batch
    means (losses, mpjpe) average -- equal-weight mean-of-means, i.e.
    the same semantics as feeding k separate batches.

    Validation sees the WHOLE split (tail batches smaller than
    batch_size), so ``k`` degrades to gcd(k, B) of the actual batch dim
    (trace-time static): a b5 tail under grad_accum=4 runs single-shot
    rather than erroring.  Worst case an indivisible large tail runs
    with bigger microbatches than B/k -- if that could exceed HBM, pick
    batch_size so the split's tail stays divisible."""
    B = jax.tree.leaves(data)[0].shape[0]
    k = math.gcd(k, B)
    if k == 1:
        return metrics_one(data, rng)

    def split(x):
        return x.reshape((k, x.shape[0] // k) + x.shape[1:])

    micro = jax.tree.map(split, data)
    rngs = jax.random.split(rng, k)

    def body(_, xs):
        data_i, rng_i = xs
        return None, metrics_one(data_i, rng_i)

    _, stacked = jax.lax.scan(body, None, (micro, rngs))
    return {key: (jnp.sum(v, axis=0)
                  if key.endswith(("_sum", "_count"))
                  else jnp.mean(v, axis=0))
            for key, v in stacked.items()}


def make_eval_step(model, cfg: Config, pck_thresholds=None):
    ts = None if pck_thresholds is None else jnp.asarray(pck_thresholds)

    @jax.jit
    def eval_step(state: TrainState, batch, rng):
        def metrics_one(batch_i, rng_i):
            out, _ = _forward(model.apply, state.params, state.batch_stats,
                              batch_i, cfg, False, rng_i)
            return _eval_metrics(out, batch_i, cfg, ts)

        return _accum_eval(metrics_one, batch, rng, cfg.grad_accum)

    return eval_step


def _make_fused_grad_one(model, cfg: Config, preprocess_fn, pp_kwargs: dict,
                         aug_flags: dict | None = None):
    """The raw-batch gradient closure shared by the fused single- and
    multi-step programs: device preprocessing (+ any enabled augs) and
    forward+backward in one traced body."""
    flags = {k: v for k, v in (aug_flags or {}).items() if v}
    forward = _maybe_remat(model, cfg)

    def grad_one(params, batch_stats, raw, rng):
        aug_rng, fwd_rng = jax.random.split(rng)
        if flags:
            batch = preprocess_fn(raw, rng=aug_rng, **pp_kwargs, **flags)
        else:
            batch = preprocess_fn(raw, **pp_kwargs)
        batch = jax.lax.stop_gradient(batch)

        def loss_fn(p):
            out, new_bs = forward(p, batch_stats, batch, fwd_rng)
            losses = compute_losses(out, batch, cfg)
            return losses["loss"], (new_bs, losses)

        (_, (new_bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, new_bs, losses

    return grad_one


def make_fused_multi_step(model, cfg: Config, preprocess_fn, pp_kwargs: dict,
                          aug_flags: dict | None = None,
                          k: int | None = None):
    """``k`` fused train steps in ONE dispatched XLA program.

    ``lax.scan`` over a stack of ``k`` raw batches (leaves shaped
    ``(k, B, ...)``): identical per-step math to
    :func:`make_fused_train_step` -- same preprocessing, gradient,
    Adam update and batch-stats chaining -- but the host dispatches
    once per ``k`` steps, removing the per-step dispatch round trip
    (through a remote tunnel that gap measured ~6% of the v5e step;
    PCIe-local it is smaller but nonzero).  Returns the new state and
    the per-step loss dicts stacked on a leading ``k`` axis, so the
    Worker can still log/NaN-check every step.

    The trade-offs are latency-of-visibility only: preemption checks
    and loss logging happen at group granularity.  Replaces the
    reference's per-batch host loop (reference trainval.py:361-362).
    """
    k = k or cfg.steps_per_dispatch
    grad_one = _make_fused_grad_one(model, cfg, preprocess_fn, pp_kwargs,
                                    aug_flags)

    def multi_step(state: TrainState, raw_stack, rng):
        rngs = jax.random.split(rng, k)

        def body(st, xs):
            raw_i, rng_i = xs
            grads, new_bs, losses = _accum_grads(grad_one, st, raw_i,
                                                 rng_i, cfg.grad_accum)
            st = st.apply_gradients(grads=grads)
            st = st.replace(batch_stats=new_bs)
            return st, losses

        state, losses_k = jax.lax.scan(body, state, (raw_stack, rngs))
        return state, losses_k

    return _train_jit(multi_step, cfg)


def make_fused_train_step(model, cfg: Config, preprocess_fn, pp_kwargs: dict,
                          aug_flags: dict | None = None):
    """Train step that takes a RAW host batch and runs the device
    preprocessing INSIDE the same XLA program as forward+backward+update.

    Measured on v5e (b128 flagship): preprocess+forward as one program is
    ~2x faster than as two (the scoremap dict never makes an HBM round
    trip between programs, and XLA fuses the render into its consumers).
    The raw->sample geometry gets no gradient (labels + network input),
    so it adds nothing to the backward pass.
    """
    grad_one = _make_fused_grad_one(model, cfg, preprocess_fn, pp_kwargs,
                                    aug_flags)

    def train_step(state: TrainState, raw, rng):
        grads, new_bs, losses = _accum_grads(grad_one, state, raw, rng,
                                             cfg.grad_accum)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_bs)
        return state, losses

    return _train_jit(train_step, cfg)


def make_fused_eval_step(model, cfg: Config, preprocess_fn, pp_kwargs: dict,
                         pck_thresholds=None):
    ts = None if pck_thresholds is None else jnp.asarray(pck_thresholds)

    @jax.jit
    def eval_step(state: TrainState, raw, rng):
        def metrics_one(raw_i, rng_i):
            batch = preprocess_fn(raw_i, **pp_kwargs)
            out, _ = _forward(model.apply, state.params, state.batch_stats,
                              batch, cfg, False, rng_i)
            return _eval_metrics(out, batch, cfg, ts)

        return _accum_eval(metrics_one, raw, rng, cfg.grad_accum)

    return eval_step
