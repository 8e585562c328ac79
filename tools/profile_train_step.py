#!/usr/bin/env python
"""Profile the PRODUCTION fused train or inference step on the chip.

Captures a ``jax.profiler`` trace of the actual production program --
``--program train``: the Worker's fused step (raw batch -> device
preprocess + forward + backward + Adam in one XLA program,
train/steps.py::make_fused_train_step); ``--program infer``: the
serving program (bench.make_fused_infer_pipe, raw batch -> preprocess +
flagship forward) -- and prints the top time sinks by aggregating op
self-times from the xplane proto (tensorboard-plugin-profile's
pure-protobuf reader; no TF needed).

Usage:  python tools/profile_train_step.py [--program train|infer]
        [--batch 256] [--steps 10] [--out /tmp/hpt_profile]
The raw trace stays on disk for TensorBoard's profile plugin.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def capture_infer(batch: int, steps: int, out_dir: str) -> None:
    """Trace the serving program: fused preprocess + flagship forward."""
    import jax
    import jax.numpy as jnp

    import bench
    from handpose_tpu.config import Config
    from handpose_tpu.data.preprocess import model_input
    from handpose_tpu.data.synthetic import fake_sample_batch
    from handpose_tpu.models import build_model

    cfg = Config(model_name="Hand3DPosePriorNetwork", input_channels=21,
                 batch_size=batch)
    model = build_model(cfg)
    warm = fake_sample_batch(batch, cfg.crop_size, cfg.input_channels,
                             seed=0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, model_input(warm, 21),
        warm["camera_intrinsic_matrix"], warm["keypoint_scale"],
        warm["keypoint_xyz_root"], train=False)
    ds = bench._bench_dataset()
    raw = jax.device_put(ds.raw_batch([i % len(ds) for i in range(batch)]))
    pipe = bench.make_fused_infer_pipe(cfg, model, variables)

    carry = pipe(raw, jnp.zeros(()))       # compile outside the trace
    float(np.asarray(carry))
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            carry = pipe(raw, carry)
        float(np.asarray(carry))
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = pipe(raw, carry)
    float(np.asarray(carry))
    dt = (time.perf_counter() - t0) / steps
    print(f"# infer {dt * 1e3:.2f} ms untraced "
          f"({batch / dt:.0f} img/s)", file=sys.stderr)


def capture_ddim(batch: int, steps: int, out_dir: str) -> None:
    """Trace the jitted 200-step DDIM sample loop (the serving-latency
    headline, bench.bench_diffusion_p50's program) at --batch (default 8
    there)."""
    import jax
    import jax.numpy as jnp

    from handpose_tpu.config import Config
    from handpose_tpu.nn.diffusion import DiffusionJointEstimation

    cfg = Config(model_name="DiffusionHandPose", input_channels=3)
    dje = DiffusionJointEstimation(
        keypoint_num=cfg.keypoint_num,
        condition_feat_dim=cfg.condition_feat_dim,
        num_timesteps=cfg.num_timesteps,
        num_sampling_timesteps=cfg.num_sampling_timesteps,
        sampler_unroll=cfg.sampler_unroll)
    feat = jnp.zeros((batch, cfg.condition_feat_dim), jnp.float32)
    x0 = jnp.zeros((batch, 1, cfg.keypoint_num * 3), jnp.float32)
    variables = dje.init({"params": jax.random.PRNGKey(0)}, x0, feat,
                         jax.random.PRNGKey(1))

    @jax.jit
    def sample(rng):
        return dje.apply(variables, feat, rng, method=dje.sample)

    float(np.asarray(sample(jax.random.PRNGKey(2))).sum())   # compile
    with jax.profiler.trace(out_dir):
        for i in range(steps):
            out = sample(jax.random.PRNGKey(3 + i))
        float(np.asarray(out).sum())
    t0 = time.perf_counter()
    for i in range(steps):
        out = sample(jax.random.PRNGKey(3 + i))
    float(np.asarray(out).sum())
    dt = (time.perf_counter() - t0) / steps
    print(f"# ddim sample {dt * 1e3:.2f} ms untraced (b{batch})",
          file=sys.stderr)


def capture(batch: int, steps: int, out_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from handpose_tpu.config import Config
    from handpose_tpu.data.preprocess import model_input, preprocess_batch
    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
    from handpose_tpu.train.state import create_train_state
    from handpose_tpu.train.steps import make_fused_train_step

    cfg = Config(model_name="Hand3DPosePriorNetwork", input_channels=21,
                 batch_size=batch)
    anno = os.path.join(bench.BENCH_DATA, "evaluation",
                        "anno_evaluation.pickle")
    if not os.path.exists(anno):
        write_synthetic_rhd(bench.BENCH_DATA, "evaluation", bench.N_SAMPLES)
    ds = RHDDataset(bench.BENCH_DATA, "evaluation", cache_decoded=True)
    raw = jax.device_put(ds.raw_batch(list(range(batch))))
    pp_kwargs = dict(crop_size=cfg.crop_size, sigma=cfg.sigma,
                     switch_joint_order=cfg.joint_order_switched)
    sample = preprocess_batch(raw, **pp_kwargs)
    inp = model_input(sample, cfg.input_channels)
    pose_x0 = sample["keypoint_xyz21_rel_normed"].reshape(batch, 1, -1)
    args = (inp, sample["camera_intrinsic_matrix"],
            sample["keypoint_scale"], sample["keypoint_xyz_root"], pose_x0)
    model = __import__("handpose_tpu.models",
                       fromlist=["build_model"]).build_model(cfg)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    step = make_fused_train_step(model, cfg, preprocess_batch, pp_kwargs)
    rng = jax.random.PRNGKey(1)

    state, m = step(state, raw, rng)       # compile outside the trace
    float(np.asarray(m["loss"]))

    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            state, m = step(state, raw, rng)
        float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, raw, rng)
    float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / steps
    print(f"# step {dt * 1e3:.2f} ms untraced "
          f"({batch / dt:.0f} img/s)", file=sys.stderr)


def top_ops(out_dir: str, k: int = 15, per_hlo: bool = False):
    """Aggregate per-op self time from the device plane of the xplane.

    ``per_hlo=True`` keeps each HLO instruction distinct (no kind
    grouping) -- the view for ranking individual backward-pass targets."""
    import xplane_pb2  # vendored public schema, see tools/xplane.proto

    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    totals: dict = defaultdict(float)
    count: dict = defaultdict(int)
    device_total = 0.0
    for plane in xspace.planes:
        name = plane.name.lower()
        if "tpu" not in name or "host" in name:
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            # ONLY the synchronous per-op line: 'XLA Modules'/'Steps' are
            # whole-program spans and 'Async XLA Ops' (copy-start/-done)
            # overlap compute -- counting either double-books the time
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = emeta.get(ev.metadata_id)
                if meta is None:
                    continue
                dur_us = ev.duration_ps / 1e6
                # group by op kind: '%convolution.42 = ...' -> 'convolution',
                # '%fusion.7 = bf16[...] fusion(...), kind=kLoop ...' keeps
                # its hlo name prefix for readability
                label = meta.name.split(" = ")[0].lstrip("%")
                if per_hlo:
                    # keep the instruction id; append the profiler's
                    # display name (usually the originating jax op path)
                    if meta.display_name and meta.display_name != label:
                        label = f"{label} [{meta.display_name}]"
                else:
                    label = label.rsplit(".", 1)[0]
                totals[label] += dur_us
                count[label] += 1
                device_total += dur_us
    ranked = [(n, t, count[n]) for n, t in
              sorted(totals.items(), key=lambda kv: -kv[1])[:k]]
    return ranked, device_total


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--program", choices=("train", "infer", "ddim"),
                    default="train")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/hpt_profile")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; parse an existing trace dir")
    ap.add_argument("--per-hlo", action="store_true",
                    help="rank individual HLO instructions instead of "
                         "grouping by op kind")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()
    if not args.parse_only:
        {"train": capture, "infer": capture_infer,
         "ddim": capture_ddim}[args.program](
            args.batch, args.steps, args.out)
    ranked, total = top_ops(args.out, k=args.top, per_hlo=args.per_hlo)
    print(json.dumps({
        "trace_dir": args.out,
        "device_busy_us": round(total, 1),
        "top_ops": [{"op": n, "total_us": round(t, 1), "count": c,
                     "pct": round(100 * t / max(total, 1e-9), 2)}
                    for n, t, c in ranked],
    }, indent=2))


if __name__ == "__main__":
    main()
