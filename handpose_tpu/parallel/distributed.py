"""Multi-host (multi-slice) initialisation and per-host data sharding.

TPU-native replacement for the reference's DDP/NCCL template
(reference dist.py:9-52: init_process_group("nccl"), DDP wrap,
DistributedSampler, mp.spawn).  On TPU pods the launcher runs one process
per host; ``initialize_distributed`` wires them into one JAX runtime, the
global mesh spans all slices over ICI/DCN, and ``HostShardSampler``
replaces DistributedSampler by giving each host its contiguous shard of
every (deterministically shuffled) epoch.

Single-host use is a no-op: all helpers degrade gracefully when
``jax.process_count() == 1``.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Wire multi-host JAX (wraps jax.distributed.initialize).

    With no arguments, relies on the TPU environment's auto-bootstrap;
    explicit arguments (or JAX_COORDINATOR_ADDRESS etc.) cover manual
    launches.  Safe to call when already initialised or single-host.
    """
    if num_processes in (None, 1) and coordinator_address is None \
            and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and jax.process_count() == 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # tolerate double-initialisation only; anything else (coordinator
        # unreachable, rank mismatch) must surface, not silently degrade
        # the run to single-process
        if "already" not in str(e).lower():
            raise


class HostShardSampler:
    """Deterministic per-host epoch sharding (DistributedSampler analogue).

    Every host sees the same shuffled permutation (seeded by epoch) and
    takes its contiguous slice; lengths are truncated to a common multiple
    so global batches stay full and identical in shape across hosts.
    """

    def __init__(self, dataset_len: int, global_batch_size: int,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None, shuffle: bool = True,
                 seed: int = 0):
        self.n = dataset_len
        self.shuffle = shuffle
        self.seed = seed
        self.rank = (process_index if process_index is not None
                     else jax.process_index())
        self.world = (process_count if process_count is not None
                      else jax.process_count())
        assert global_batch_size % self.world == 0, \
            "global batch must divide across hosts"
        self.local_batch = global_batch_size // self.world
        usable = dataset_len - (dataset_len % global_batch_size)
        self.per_host = usable // self.world

    def epoch_indices(self, epoch: int) -> np.ndarray:
        order = np.arange(self.n)
        if self.shuffle:
            np.random.default_rng(self.seed * 100003 + epoch).shuffle(order)
        start = self.rank * self.per_host
        return order[start:start + self.per_host]

    def local_batches(self, epoch: int) -> Iterator[Sequence[int]]:
        idx = self.epoch_indices(epoch)
        for s in range(0, len(idx), self.local_batch):
            chunk = idx[s:s + self.local_batch]
            if len(chunk) == self.local_batch:
                yield chunk.tolist()

    def local_batches_padded(self, epoch: int):
        """Whole-split per-host batches for validation: the epoch order is
        padded (wrap-around) up to a multiple of the global batch so every
        sample is seen EXACTLY once across hosts (DistributedSampler-style
        padding), and each chunk comes with a validity mask marking the
        pad duplicates -- the consumer zeroes their visibility so the
        mpjpe_sum/count aggregation weighs the tail exactly.

        Yields ``(indices, valid)`` with ``indices`` a local_batch-long
        list and ``valid`` a (local_batch,) bool array.
        """
        order = np.arange(self.n)
        if self.shuffle:
            np.random.default_rng(self.seed * 100003 + epoch).shuffle(order)
        global_batch = self.local_batch * self.world
        pad = (-self.n) % global_batch
        padded = np.concatenate([order, order[:pad]])
        valid = np.concatenate([np.ones(self.n, bool), np.zeros(pad, bool)])
        per_host = len(padded) // self.world
        start = self.rank * per_host
        idx = padded[start:start + per_host]
        v = valid[start:start + per_host]
        for s in range(0, len(idx), self.local_batch):
            yield idx[s:s + self.local_batch].tolist(), \
                v[s:s + self.local_batch]
