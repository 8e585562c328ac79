#!/usr/bin/env python
"""Multi-chip scaling diagnostics on the virtual CPU mesh.

Evidence that the dp x tp shardings do what parallel/sharding.py claims:
for each (n_devices, tp) layout this compiles the PRODUCTION fused
sharded train step (raw batch -> device preprocess + fwd + bwd + Adam)
and reports

* a collective census from the compiled HLO -- all-reduce count for the
  dp gradient psum, all-gather / reduce-scatter / collective-permute for
  the tp layouts (dp-only must show NO tp collectives);
* step wall time (median of ``--steps``) at fixed PER-DEVICE batch
  (weak scaling).  Caveat printed in the JSON: virtual devices share one
  host's cores, so wall time measures collective/partition overhead
  trends, not real ICI speedup.

Usage:
    python tools/multichip_diagnostics.py [--out docs/MULTICHIP_DIAG.json]

Re-execs itself under JAX_PLATFORMS=cpu with an 8-device virtual host
platform when the current backend has too few devices (same trick as
__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# dp-only ladder + dp x tp layouts + the train-path program variants the
# Worker can actually ship (k-step dispatch groups change the scanned
# program structure under the mesh; grad-accum scans microbatches)
LAYOUTS = [
    dict(n=1, tp=1), dict(n=2, tp=1), dict(n=4, tp=1), dict(n=8, tp=1),
    dict(n=4, tp=2), dict(n=8, tp=2),
    dict(n=8, tp=1, k=2), dict(n=8, tp=2, k=2), dict(n=8, tp=1, accum=2),
]
N_NEEDED = max(l["n"] for l in LAYOUTS)

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def collective_census(hlo_text: str) -> dict:
    """Count collective HLOs (sync + async -start forms) in compiled HLO.

    The opcode follows the result type in an instruction line; the type
    may be a TUPLE containing spaces when XLA's combiner merges several
    collectives into one multi-operand op ('= (f32[..], f32[..])
    all-reduce('), so the type is matched as anything without '='.
    Metadata op_name strings use underscores (psum/all_gather), so the
    hyphenated HLO opcodes don't false-positive there.
    """
    census = {}
    for kind in _COLLECTIVES:
        n = len(re.findall(rf"= [^=\n]* {kind}(?:-start)?\(", hlo_text))
        census[kind] = n
    return census


def run_layout(n_devices: int, tp: int, per_device_batch: int,
               steps: int, k: int = 1, accum: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from handpose_tpu.config import Config
    from handpose_tpu.data.preprocess import (RawBatch, model_input,
                                              preprocess_batch)
    from handpose_tpu.models import build_model
    from handpose_tpu.parallel import shard_batch
    from handpose_tpu.parallel.mesh import shard_batch_stacked
    from handpose_tpu.parallel.sharding import (make_dp_tp_mesh,
                                                shard_train_state)
    from handpose_tpu.train.state import create_train_state
    from handpose_tpu.train.steps import (make_fused_multi_step,
                                          make_fused_train_step)

    mesh = make_dp_tp_mesh(n_devices, tp=tp)
    dp = mesh.shape["data"]
    B, S = per_device_batch * dp, 80
    cfg = Config(model_name="Hand3DPosePriorNetwork", input_channels=21,
                 input_img_shape=(64, 64), batch_size=B,
                 compute_dtype="float32", max_epoch=2,
                 steps_per_dispatch=k, grad_accum=accum)
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    K = np.tile(np.asarray([[80., 0, 40], [0, 80., 40], [0, 0, 1]],
                           np.float32), (B, 1, 1))
    xyz = (rng.normal(size=(B, 42, 3)) * 0.05 +
           np.asarray([0, 0, 0.6])).astype(np.float32)
    uvw = np.einsum("bij,bkj->bki", K, xyz)
    raw = RawBatch(
        image=rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        mask=rng.integers(0, 34, (B, S, S), dtype=np.uint8),
        keypoint_uv=(uvw[..., :2] / uvw[..., 2:3]).astype(np.float32),
        keypoint_vis=(rng.uniform(size=(B, 42)) > 0.3),
        keypoint_xyz=xyz, camera_K=K)

    pp_kwargs = dict(crop_size=cfg.crop_size, sigma=cfg.sigma,
                     switch_joint_order=cfg.joint_order_switched)
    batch = preprocess_batch(jax.device_put(raw), **pp_kwargs)
    inp = model_input(batch, cfg.input_channels)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(B, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 4)
    state = shard_train_state(state, mesh)
    # count the INPUT layout (what shard_train_state placed), not the
    # step's output state -- XLA may pick different output shardings
    shards = [v.sharding.spec for v in jax.tree.leaves(state.params)]
    n_tp_sharded = sum(1 for s in shards if any(a == "model" for a in s))
    if k > 1:
        # k-step dispatch group: scan axis leads, replicated; axis 1 is
        # each step's batch, sharded like the single-step path
        step = make_fused_multi_step(model, cfg, preprocess_batch,
                                     pp_kwargs, k=k)
        sharded_raw = shard_batch_stacked(
            jax.tree.map(lambda a: np.stack([a] * k), raw), mesh)
    else:
        step = make_fused_train_step(model, cfg, preprocess_batch,
                                     pp_kwargs)
        sharded_raw = shard_batch(raw, mesh)

    hlo = step.lower(state, sharded_raw,
                     jax.random.PRNGKey(1)).compile().as_text()
    census = collective_census(hlo)

    state, m = step(state, sharded_raw, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(m["loss"])
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        state, m = step(state, sharded_raw, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
    loss = m["loss"]
    if k > 1:
        loss = loss[-1]          # per-step losses stacked on axis 0
    return {
        "n_devices": n_devices, "dp": dp, "tp": tp,
        "steps_per_dispatch": k, "grad_accum": accum,
        "global_batch": B, "per_device_batch": per_device_batch,
        "step_ms_median": round(statistics.median(times) / k * 1e3, 1),
        "loss_finite": bool(jnp.isfinite(loss)),
        "collectives": census,
        "params_tp_sharded": n_tp_sharded,
        "params_total": len(shards),
    }


def main_body(per_device_batch: int, steps: int, out: str | None) -> None:
    import jax

    rows = [run_layout(l["n"], l["tp"], per_device_batch, steps,
                       k=l.get("k", 1), accum=l.get("accum", 1))
            for l in LAYOUTS]
    dp_only = [r for r in rows if r["tp"] == 1]
    # invariants the docstrings claim -- checked, not just printed
    for r in dp_only:
        # the no-tp-collective claim holds for the PLAIN step program;
        # a grad-accum microbatch scan legitimately inserts data-
        # movement all-gathers for the batch-sharded scan slices even
        # with zero tp-sharded params (see the variants in
        # docs/MULTICHIP_DIAG.json -- params_tp_sharded pins tp-ness)
        if r["grad_accum"] == 1:
            assert sum(r["collectives"][k] for k in
                       ("all-gather", "reduce-scatter", "all-to-all")) == 0, \
                f"dp-only layout emitted tp collectives: {r}"
        assert r["params_tp_sharded"] == 0, r
        if r["n_devices"] == 1:
            assert r["collectives"]["all-reduce"] == 0, \
                f"single-device program emitted collectives: {r}"
        else:
            assert r["collectives"]["all-reduce"] >= 1, \
                f"dp layout emitted no gradient all-reduce: {r}"
    for r in rows:
        if r["tp"] > 1:
            assert r["params_tp_sharded"] > 0, r
            assert (r["collectives"]["all-gather"]
                    + r["collectives"]["reduce-scatter"]
                    + r["collectives"]["all-reduce"]) > 0, r
        assert r["loss_finite"], r
    result = {
        "backend": jax.devices()[0].platform,
        "note": ("virtual CPU mesh: step_ms measures partition/collective "
                 "overhead trends at fixed per-device batch (devices share "
                 "one host's cores), not real ICI scaling; the collective "
                 "census + sharded-param counts are exact properties of "
                 "the compiled programs"),
        "per_device_batch": per_device_batch,
        "layouts": rows,
    }
    text = json.dumps(result, indent=2)
    print(text)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default=None,
                    help="also write the JSON here "
                         "(e.g. docs/MULTICHIP_DIAG.json)")
    args = ap.parse_args()

    if os.environ.get("_HPT_DIAG_CHILD") != "1":
        import jax
        try:
            have = len(jax.devices())
        except RuntimeError:
            have = 0
        if have < N_NEEDED or jax.devices()[0].platform != "cpu":
            # same re-exec trick as __graft_entry__.dryrun_multichip: the
            # backend pins device count at first init, so force an
            # N-device CPU platform in a child process
            env = dict(os.environ, _HPT_DIAG_CHILD="1",
                       JAX_PLATFORMS="cpu")
            flags = [f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f]
            flags.append(
                f"--xla_force_host_platform_device_count={N_NEEDED}")
            env["XLA_FLAGS"] = " ".join(flags)
            env["PYTHONPATH"] = REPO + os.pathsep + env.get(
                "PYTHONPATH", "")
            raise SystemExit(subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=env, cwd=REPO).returncode)
    else:
        import jax
        jax.config.update("jax_platforms", "cpu")
    main_body(args.per_device_batch, args.steps, args.out)


if __name__ == "__main__":
    main()
