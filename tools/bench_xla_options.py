#!/usr/bin/env python
"""Sweep XLA TPU compiler options over the PRODUCTION fused train step.

Same program as bench.bench_train_step (raw batch -> device preprocess +
fwd + bwd + Adam, flagship, bench.BATCH), recompiled per option set via
``lowered.compile(compiler_options=...)`` -- no env juggling, one
process.  Unknown/rejected options are reported, not fatal.

  python tools/bench_xla_options.py            # the curated sweep
  python tools/bench_xla_options.py --opt xla_tpu_scoped_vmem_limit_kib=65536
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# curated candidates: scoped-VMEM headroom changes what fits in a fusion's
# scratch (bigger loop fusions for the BN/relu backward passes); the
# latency-hiding scheduler reorders async copies vs compute
SWEEP = [
    {},
    {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    {"xla_tpu_enable_aggressive_loop_fusion": "true"},
]


def bench_with_options(opts: dict, iters: int = 10, windows: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from handpose_tpu.config import Config
    from handpose_tpu.data.preprocess import model_input, preprocess_batch
    from handpose_tpu.models import build_model
    from handpose_tpu.train.state import create_train_state
    from handpose_tpu.train.steps import make_fused_train_step

    B = bench.BATCH
    cfg = Config(model_name="Hand3DPosePriorNetwork", input_channels=21,
                 batch_size=B)
    model = build_model(cfg)
    ds = bench._bench_dataset()
    raw = jax.device_put(ds.raw_batch([i % len(ds) for i in range(B)]))
    pp_kwargs = dict(crop_size=cfg.crop_size, sigma=cfg.sigma,
                     switch_joint_order=cfg.joint_order_switched)
    small = jax.tree.map(lambda a: a[:8], raw)
    batch = jax.tree.map(jnp.asarray, preprocess_batch(small, **pp_kwargs))
    inp = model_input(batch, cfg.input_channels)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(8, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state0 = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    step = make_fused_train_step(model, cfg, preprocess_batch, pp_kwargs)
    rng = jax.random.PRNGKey(1)

    compiled = step.lower(state0, raw, rng).compile(
        compiler_options=opts or None)
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = 0.0
    state, m = compiled(state0, raw, rng)
    float(np.asarray(m["loss"]))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = compiled(state, raw, rng)
        float(np.asarray(m["loss"]))
        best = min(best, time.perf_counter() - t0)
    rate = B * iters / best
    return {"train_step_img_per_sec": round(rate, 1),
            "mfu_train": round((flops / B) * rate / bench.PEAK_BF16_FLOPS,
                               4),
            "loss": round(float(np.asarray(m["loss"])), 4)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--opt", action="append", default=[],
                    help="key=value; may repeat (single custom option set "
                         "instead of the curated sweep)")
    args = ap.parse_args()
    sweep = SWEEP
    if args.opt:
        sweep = [dict(kv.split("=", 1) for kv in args.opt)]
    out = {}
    for opts in sweep:
        tag = ",".join(f"{k}={v}" for k, v in opts.items()) or "baseline"
        try:
            out[tag] = bench_with_options(opts)
        except Exception as e:                      # unknown option, OOM...
            out[tag] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({tag: out[tag]}), flush=True)
    if "baseline" in out and "train_step_img_per_sec" in out["baseline"]:
        base = out["baseline"]["train_step_img_per_sec"]
        for tag, r in out.items():
            if "train_step_img_per_sec" in r:
                r["vs_baseline"] = round(
                    r["train_step_img_per_sec"] / base, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
