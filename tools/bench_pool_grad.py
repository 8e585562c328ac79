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
Measured on v5e: argmax is 0.54x native, so 'native' is the default.
"""

import json

try:                                 # script style: python tools/bench_...
    from ab_train_step import ab_train_step
except ImportError:                  # module style: python -m tools.bench_...
    from tools.ab_train_step import ab_train_step

if __name__ == "__main__":
    print(json.dumps(ab_train_step(
        "pool_grad", ("argmax", "native"), baseline="native")))
