"""Benchmark: RHD preprocessing + inference throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the end-to-end hot path of the rebuilt framework -- raw uint8
RHD-format batch -> fused device-side preprocessing (crop, transforms,
scoremaps) -> flagship-model forward (Hand3DPosePriorNetwork, the
reference's default config) -- on the real accelerator.

Baseline: the reference pipeline is input-bound at ~6-10 s per bs=200
batch fetch (author comment, reference trainval.py:270) ≈ 26.5 img/s on
its intended A100 node; vs_baseline is measured throughput / 26.5.
"""

import json
import time

import jax
import numpy as np

BASELINE_IMG_PER_SEC = 26.5   # reference: 200 imgs / ~7.55 s (20-33 img/s)


def main():
    from handpose_tpu.config import Config
    from handpose_tpu.data.preprocess import (RawBatch, model_input,
                                              preprocess_batch)
    from handpose_tpu.models import build_model

    batch_size = 128
    cfg = Config(model_name="Hand3DPosePriorNetwork", input_channels=21,
                 batch_size=batch_size)

    # synthetic RHD-format raw batch (decode cost excluded on both sides:
    # the reference's 6-10 s/batch is dominated by geometry, not PNG I/O)
    rng = np.random.default_rng(0)
    H = W = 320
    raw = RawBatch(
        image=rng.integers(0, 255, (batch_size, H, W, 3), dtype=np.uint8),
        mask=rng.integers(0, 34, (batch_size, H, W), dtype=np.uint8),
        keypoint_uv=rng.uniform(0, 320, (batch_size, 42, 2)).astype(
            np.float32),
        keypoint_vis=(rng.uniform(size=(batch_size, 42)) > 0.3),
        keypoint_xyz=(rng.normal(size=(batch_size, 42, 3)) * 0.05 +
                      np.asarray([0, 0, 0.6])).astype(np.float32),
        camera_K=np.tile(np.asarray([[320., 0, 160], [0, 320., 160],
                                     [0, 0, 1]], np.float32),
                         (batch_size, 1, 1)),
    )

    model = build_model(cfg)

    def init_args(sample):
        inp = model_input(sample, cfg.input_channels)
        return (inp, sample["camera_intrinsic_matrix"],
                sample["keypoint_scale"], sample["keypoint_xyz_root"])

    sample0 = preprocess_batch(jax.device_put(raw))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           *init_args(sample0), train=False)

    import jax.numpy as jnp

    @jax.jit
    def pipeline(raw_batch, carry):
        # value-neutral dependency on the previous iteration's output makes
        # the loop strictly sequential on device, so total time / iters is
        # honest regardless of async-dispatch / block_until_ready semantics
        raw_batch = raw_batch._replace(
            keypoint_uv=raw_batch.keypoint_uv + carry * 0.0)
        sample = preprocess_batch(raw_batch)
        out = model.apply(variables, *init_args(sample), train=False)
        return jnp.sum(out.coord_xyz_rel_normed)

    raw_dev = jax.device_put(raw)
    carry = jnp.zeros(())
    carry = pipeline(raw_dev, carry)
    float(np.asarray(carry))  # warmup / compile + full sync

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = pipeline(raw_dev, carry)
    float(np.asarray(carry))  # host fetch bounds all queued work
    dt = time.perf_counter() - t0

    img_per_sec = batch_size * iters / dt
    print(json.dumps({
        "metric": "rhd_preproc_plus_infer_throughput",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
