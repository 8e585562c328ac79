"""Worker process for the REAL 2-process distributed smoke test.

Run by tests/test_distributed_smoke.py as::

    python tests/_dist_worker.py <port> <rank> <data_root> <log_dir>

Each process: 4 virtual CPU devices, ``jax.distributed.initialize`` via
``initialize_distributed`` (the reference dist.py:9-13 analogue), one
fast-debug training epoch + a FULL validation epoch through the real
multi-host data path (HostShardSampler -> global_shard_batch -> fused
sharded step programs), then a preemption-agreement round over a REAL
``process_allgather``: only rank 1 receives SIGTERM, and both ranks must
agree to stop at the same step boundary (train/trainer.py _preempt_now).

Prints one final JSON line consumed by the test.
"""

import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, rank, data_root, log_dir = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])

    import jax

    # the image's sitecustomize pins JAX_PLATFORMS before this body runs;
    # config.update is the reliable way to force the CPU backend (the
    # spawning test provides XLA_FLAGS=--xla_force_host_platform_device_count=4)
    jax.config.update("jax_platforms", "cpu")

    from handpose_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    from handpose_tpu.config import Config
    from handpose_tpu.train import Worker

    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="RHD", dataset_root_dir=data_root,
                 batch_size=8, input_img_shape=(32, 32),
                 resnet_out_feature_dim=64, max_epoch=1, num_workers=2,
                 save_log_dir=log_dir, log_every_steps=0)
    w = Worker(cfg)
    w.run_epoch(0, "training", fast_debug=True)
    val = w.run_epoch(0, "validation")

    # preemption agreement over a REAL allgather: only rank 1 is signalled
    guard = w.enable_preemption_save()
    assert w._preempt_now() is False
    if rank == 1:
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.requested
    agreed = w._preempt_now()

    print(json.dumps({"rank": rank, "val_mpjpe": val,
                      "agreed_preempt": bool(agreed),
                      "local_requested": bool(guard.requested)}))


if __name__ == "__main__":
    main()
