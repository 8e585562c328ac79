"""Batch-size sweep for the fused preprocess+forward and train-step
programs on the real accelerator.

Explores whether larger per-chip batches lift MXU utilisation beyond the
b128 figures recorded in BENCH (conv nets under-fill the 128x128 MXU at
64ch; more batch = more parallel tiles).  Prints one JSON line per batch
size: resident fused preprocess+infer img/s, fused train-step img/s
(optionally with remat), and the XLA-counted forward MFU.

Usage:  python tools/bench_sweep.py [--batches 64,128,256,512] [--remat]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_FLOPS = 197e12


def _sync(x):
    return float(np.asarray(jnp.sum(x)))


def _flops(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256,512")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd

    root = os.environ.get("HPT_BENCH_DATA", "/tmp/hpt_bench_rhd")
    anno = os.path.join(root, "evaluation", "anno_evaluation.pickle")
    if not os.path.exists(anno):
        write_synthetic_rhd(root, "evaluation", 512)
    ds = RHDDataset(root, "evaluation", cache_decoded=True)

    for B in [int(b) for b in args.batches.split(",")]:
        try:
            _sweep_one(args, ds, B)
        except Exception as e:      # genuine step/pipe OOM at huge batches
            print(json.dumps({"batch": B, "error": type(e).__name__,
                              "remat": args.remat}), flush=True)


def _sweep_one(args, ds, B):
    from handpose_tpu.config import Config
    from handpose_tpu.data.preprocess import model_input, preprocess_batch
    from handpose_tpu.models import build_model
    from handpose_tpu.train.state import create_train_state
    from handpose_tpu.train.steps import make_fused_train_step

    cfg = Config(model_name="Hand3DPosePriorNetwork", input_channels=21,
                 batch_size=B, remat=args.remat)
    model = build_model(cfg)
    idx = [i % len(ds) for i in range(B)]
    raw = jax.device_put(ds.raw_batch(idx))
    pp_kwargs = dict(crop_size=cfg.crop_size, sigma=cfg.sigma,
                     switch_joint_order=cfg.joint_order_switched)

    # init from a tiny slice: state/variable shapes are batch-independent,
    # and eagerly preprocessing the FULL batch here is what used to OOM
    # the b1024 sweep (the sweep then blamed the step; the step fits)
    small = jax.tree.map(lambda a: a[:8], raw)
    batch = jax.tree.map(jnp.asarray, preprocess_batch(small, **pp_kwargs))
    inp = model_input(batch, cfg.input_channels)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, inp,
        batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
        batch["keypoint_xyz_root"], train=False)

    @jax.jit
    def pipe(raw, carry):
        raw = raw._replace(keypoint_uv=raw.keypoint_uv + carry * 0.0)
        s = preprocess_batch(raw, crop_size=cfg.crop_size)
        out = model.apply(variables, model_input(s, cfg.input_channels),
                          s["camera_intrinsic_matrix"],
                          s["keypoint_scale"], s["keypoint_xyz_root"],
                          train=False)
        return jnp.sum(out.coord_xyz_rel_normed)

    carry = pipe(raw, jnp.zeros(()))
    _sync(carry)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        carry = pipe(raw, carry)
    _sync(carry)
    fwd_rate = B * args.iters / (time.perf_counter() - t0)
    fwd_flops = _flops(pipe, raw, jnp.zeros(())) / B

    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(
        inp.shape[0], 1, -1)
    sargs = (inp, batch["camera_intrinsic_matrix"],
             batch["keypoint_scale"], batch["keypoint_xyz_root"],
             pose_x0)
    state = create_train_state(model, cfg, sargs,
                               jax.random.PRNGKey(0), 10)
    step = make_fused_train_step(model, cfg, preprocess_batch, pp_kwargs)
    rng = jax.random.PRNGKey(1)
    try:
        state, m = step(state, raw, rng)
        _sync(m["loss"])
        t0 = time.perf_counter()
        for _ in range(max(args.iters // 2, 5)):
            state, m = step(state, raw, rng)
        _sync(m["loss"])
        train_rate = B * max(args.iters // 2, 5) / (
            time.perf_counter() - t0)
    except Exception as e:   # e.g. OOM at very large batches
        train_rate = None
        print(f"# train step failed at B={B}: {type(e).__name__}",
              file=sys.stderr)

    print(json.dumps({
        "batch": B,
        "fused_infer_img_per_sec": round(fwd_rate, 1),
        "train_step_img_per_sec": (round(train_rate, 1)
                                   if train_rate else None),
        "mfu_forward": round(fwd_flops * fwd_rate / PEAK_BF16_FLOPS, 4),
        "remat": args.remat,
    }), flush=True)


if __name__ == "__main__":
    main()
