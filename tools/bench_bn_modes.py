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

try:                                 # script style: python tools/bench_...
    from ab_train_step import ab_train_step
except ImportError:                  # module style: python -m tools.bench_...
    from tools.ab_train_step import ab_train_step

if __name__ == "__main__":
    print(json.dumps(ab_train_step(
        "bn_variance", ("stable", "fast", "shifted"), baseline="stable")))
