#!/usr/bin/env python
"""A/B gradient accumulation at batch sizes around single-shot HBM limits.

``Config.grad_accum`` reshapes the step's batch into k sequential
microbatches inside a lax.scan so activations AND the fused-preprocess
scoremaps materialise per-microbatch.  Measured on v5e (flagship, bf16):

  b1024 accum=1: 3000.8 img/s, 10.73 GiB temp HBM
  b1024 accum=4: 3047.5 img/s,  3.00 GiB temp HBM
  b4096 accum=16: 3072.6 img/s, 3.35 GiB temp HBM (single-shot OOMs)

(The earlier bench_sweep "b1024 RESOURCE_EXHAUSTED" was the sweep
harness eagerly preprocessing + model.init'ing the full batch, not the
step; both harnesses now init from an 8-sample slice.)

  python tools/bench_grad_accum.py [--batch 1024] [--accums 1,4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--accums", default="1,4")
    args = ap.parse_args()

    import bench
    from handpose_tpu.config import Config
    from handpose_tpu.models import build_model

    results = {"batch": args.batch}
    for k in (int(v) for v in args.accums.split(",")):
        cfg = Config(model_name="Hand3DPosePriorNetwork",
                     input_channels=21, batch_size=args.batch,
                     grad_accum=k)
        model = build_model(cfg)
        try:
            rate, flops = bench.bench_train_step(cfg, model, args.batch)
            r = {"train_step_img_per_sec": round(rate, 1)}
            if k == 1:
                r["mfu_train"] = round((flops / args.batch) * rate /
                                       bench.PEAK_BF16_FLOPS, 4)
            else:
                # XLA cost_analysis counts the scan body ONCE (not x trip
                # count), so scale by k; the (tiny) once-per-step Adam
                # update gets overcounted k-fold -> 'approx'
                r["mfu_train_approx"] = round((flops * k / args.batch) *
                                              rate / bench.PEAK_BF16_FLOPS, 4)
            results[f"grad_accum={k}"] = r
        except Exception as e:   # RESOURCE_EXHAUSTED is a result here
            results[f"grad_accum={k}"] = {"error": f"{type(e).__name__}: "
                                          f"{str(e)[:200]}"}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
