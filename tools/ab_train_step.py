"""Shared A/B harness: bench the production fused train step once per
value of one Config field and print one JSON line of results.

Used by tools/bench_bn_modes.py (bn_variance) and
tools/bench_pool_grad.py (pool_grad); also runnable directly:

  python tools/ab_train_step.py --field bn_variance --values stable,fast
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ab_train_step(field: str, values, baseline: str) -> dict:
    """Measure bench.bench_train_step (fused preprocess+fwd+bwd+Adam,
    bench.BATCH, flagship) for each ``Config.<field> = value``; the
    ``vs_<baseline>`` key is each rate over the baseline value's rate.

    Values go through ``apply_overrides`` so they are coerced to the
    field's declared type -- the CLI path hands in raw strings, and e.g.
    ``--field remat --values False,True`` must not set the truthy
    STRING "False" on the baseline arm."""
    import bench
    from handpose_tpu.config import Config, apply_overrides
    from handpose_tpu.models import build_model

    assert baseline in values, f"baseline {baseline!r} not in {values}"
    results = {}
    for value in values:
        cfg = apply_overrides(
            Config(model_name="Hand3DPosePriorNetwork",
                   input_channels=21, batch_size=bench.BATCH),
            [f"{field}={value}"])
        model = build_model(cfg)
        rate, flops = bench.bench_train_step(cfg, model)
        results[value] = {
            "train_step_img_per_sec": round(rate, 1),
            "mfu_train": round((flops / bench.BATCH) * rate /
                               bench.PEAK_BF16_FLOPS, 4),
        }
    base = results[baseline]["train_step_img_per_sec"]
    for r in results.values():
        r[f"vs_{baseline}"] = round(r["train_step_img_per_sec"] / base, 4)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--field", required=True,
                    help="Config field to sweep (e.g. bn_variance)")
    ap.add_argument("--values", required=True,
                    help="comma-separated values; first is the baseline")
    args = ap.parse_args()
    values = args.values.split(",")
    print(json.dumps(ab_train_step(args.field, values, values[0])))


if __name__ == "__main__":
    main()
