#!/usr/bin/env python
"""A/B the three BatchNorm variance modes on the production train step.

Runs bench.bench_train_step (fused preprocess+fwd+bwd+Adam, b256,
flagship) once per mode on the real accelerator and prints one JSON line:

  python tools/bench_bn_modes.py
  {"stable": {...}, "fast": {...}, "shifted": {...}}

Context: 'stable' (two-pass, torch semantics) is the default and costs a
measured ~7.6% vs 'fast'; 'shifted' (nn/norm.py) aims to buy that back
with one HBM read while keeping partition-invariance after warm-up.
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
    for mode in ("stable", "fast", "shifted"):
        cfg = Config(model_name="Hand3DPosePriorNetwork",
                     input_channels=21, batch_size=bench.BATCH,
                     bn_variance=mode)
        model = build_model(cfg)
        rate, flops = bench.bench_train_step(cfg, model)
        results[mode] = {
            "train_step_img_per_sec": round(rate, 1),
            "mfu_train": round((flops / bench.BATCH) * rate /
                               bench.PEAK_BF16_FLOPS, 4),
        }
    base = results["stable"]["train_step_img_per_sec"]
    for mode, r in results.items():
        r["vs_stable"] = round(r["train_step_img_per_sec"] / base, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
