"""REAL 2-process distributed bring-up (no stubs, no injected ranks).

Spawns two OS processes that ``jax.distributed.initialize`` against a
local coordinator on the CPU backend (4 virtual devices each -> one
8-device global mesh), exercising the layers every other multi-host test
covers only in-process:

* ``parallel.distributed.initialize_distributed`` (reference dist.py:9-13)
* ``HostShardSampler`` under REAL process ranks feeding
  ``global_shard_batch`` + the fused sharded train/eval step programs
* whole-split padded validation across hosts (both ranks must agree on
  the exact epoch MPJPE)
* the cross-host preemption agreement over a REAL ``process_allgather``:
  SIGTERM lands on rank 1 only, both ranks must stop together
  (train/trainer.py ``_preempt_now``)
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke(tmp_path):
    from handpose_tpu.data.rhd import write_synthetic_rhd

    # 20 train / 10 val at global batch 8: training truncates to 2 steps,
    # validation pads 10 -> 16 and must still weigh exactly 10 samples
    write_synthetic_rhd(str(tmp_path), "training", n=20, seed=0)
    write_synthetic_rhd(str(tmp_path), "evaluation", n=10, seed=1)

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(port), str(rank), str(tmp_path),
         str(tmp_path / f"logs{rank}")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for rank in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_rank = {o["rank"]: o for o in outs}
    assert set(by_rank) == {0, 1}
    # the global SPMD eval program returns the SAME exact epoch MPJPE on
    # every host (replicated reduction over the padded whole split)
    v0, v1 = by_rank[0]["val_mpjpe"], by_rank[1]["val_mpjpe"]
    assert np.isfinite(v0) and v0 > 0
    assert abs(v0 - v1) <= 1e-9 * max(abs(v0), 1.0)
    # only rank 1 was signalled, but BOTH agreed to stop (real allgather)
    assert by_rank[0]["local_requested"] is False
    assert by_rank[1]["local_requested"] is True
    assert by_rank[0]["agreed_preempt"] is True
    assert by_rank[1]["agreed_preempt"] is True
