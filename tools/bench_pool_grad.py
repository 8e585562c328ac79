#!/usr/bin/env python
"""A/B the stem max-pool gradient implementations on the train step.

Runs bench.bench_train_step (fused preprocess+fwd+bwd+Adam, b256,
flagship) once per ops/pooling.py implementation and prints one JSON
line:

  python tools/bench_pool_grad.py
  {"argmax": {...}, "native": {...}}

Context: the on-chip profile (tools/profile_train_step.py, NOTES_r3.md)
showed the flax/XLA pool gradient as two serial select-and-scatter HLOs
at 2.17 ms each = 5.2% of the step; 'argmax' re-expresses that backward
as one fused elementwise pass with identical first-max tie routing.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    from handpose_tpu.config import Config
    from handpose_tpu.models import build_model

    results = {}
    for impl in ("argmax", "native"):
        cfg = Config(model_name="Hand3DPosePriorNetwork",
                     input_channels=21, batch_size=bench.BATCH,
                     pool_grad=impl)
        model = build_model(cfg)
        rate, flops = bench.bench_train_step(cfg, model)
        results[impl] = {
            "train_step_img_per_sec": round(rate, 1),
            "mfu_train": round((flops / bench.BATCH) * rate /
                               bench.PEAK_BF16_FLOPS, 4),
        }
    base = results["native"]["train_step_img_per_sec"]
    for impl, r in results.items():
        r["vs_native"] = round(r["train_step_img_per_sec"] / base, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
