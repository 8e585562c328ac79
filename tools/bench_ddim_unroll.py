#!/usr/bin/env python
"""A/B the DDIM sampler's scan-unroll factor (and batch scaling).

The on-chip trace (tools/profile_train_step.py --program ddim) shows the
200-step DDIM loop is tiny-op bound: ~600 HLOs per denoise step, each
~0.2 us, fully device-busy.  Unrolling the lax.scan lets XLA schedule k
steps' ops together (same math); larger batches amortise the fixed
per-op cost into throughput.  Prints one JSON line:
p50 latency per unroll factor at --batch, plus samples/sec at
--throughput-batch.

  python tools/bench_ddim_unroll.py [--batch 8] [--unrolls 1,2,4,8]
                                    [--throughput-batch 256]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _p50(sample_fn, rngs):
    import numpy as np

    lat = []
    for r in rngs:
        t0 = time.perf_counter()
        float(np.asarray(sample_fn(r)).sum())
        lat.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(lat)


def bench_one(batch: int, unroll: int, iters: int = 9) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from handpose_tpu.config import Config
    from handpose_tpu.nn.diffusion import DiffusionJointEstimation

    cfg = Config(model_name="DiffusionHandPose", input_channels=3)
    dje = DiffusionJointEstimation(
        keypoint_num=cfg.keypoint_num,
        condition_feat_dim=cfg.condition_feat_dim,
        num_timesteps=cfg.num_timesteps,
        num_sampling_timesteps=cfg.num_sampling_timesteps,
        sampler_unroll=unroll)
    feat = jnp.zeros((batch, cfg.condition_feat_dim), jnp.float32)
    x0 = jnp.zeros((batch, 1, cfg.keypoint_num * 3), jnp.float32)
    variables = dje.init({"params": jax.random.PRNGKey(0)}, x0, feat,
                         jax.random.PRNGKey(1))

    @jax.jit
    def sample(rng):
        return dje.apply(variables, feat, rng, method=dje.sample)

    float(np.asarray(sample(jax.random.PRNGKey(2))).sum())   # compile
    return _p50(sample, [jax.random.PRNGKey(3 + i) for i in range(iters)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--unrolls", default="1,2,4,8")
    ap.add_argument("--throughput-batch", type=int, default=256)
    args = ap.parse_args()

    out = {"batch": args.batch}
    best = (None, float("inf"))
    for u in (int(v) for v in args.unrolls.split(",")):
        p50 = bench_one(args.batch, u)
        out[f"unroll={u}_p50_ms"] = round(p50, 2)
        if p50 < best[1]:
            best = (u, p50)
    out["best_unroll"] = best[0]
    if args.throughput_batch:
        tb = args.throughput_batch
        p50 = bench_one(tb, best[0], iters=5)
        out[f"throughput_b{tb}_samples_per_sec"] = round(tb / (p50 / 1e3), 1)
        out[f"throughput_b{tb}_p50_ms"] = round(p50, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
