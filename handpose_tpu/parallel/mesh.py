"""Device mesh + sharding helpers.

TPU-native replacement for the reference's distributed story (the orphan
DDP/NCCL template, reference dist.py:9-52): a `jax.sharding.Mesh` over ICI
with batch-axis ("data") sharding under jit -- gradient all-reduce is
emitted by XLA as `psum` on the interconnect, no process groups or NCCL
calls.  Works identically on 1 chip, an 8-device CPU test mesh, or a pod
slice; multi-host extends via `jax.distributed.initialize` with per-host
data loading.

The mesh also carries an optional "model" axis for tensor-parallel layouts
of the wide fc heads (unused at batch sizes this framework targets, but the
shardings compile and the axis is exercised by dryrun_multichip).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              shape: Sequence[int] = (-1,),
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh; -1 in ``shape`` absorbs the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1]))
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // max(known, 1)
    n = int(np.prod(shape))
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place every array in a pytree batch-sharded over the data axis.

    Multi-host: each process passes its LOCAL shard of the global batch
    (from ``HostShardSampler``) and gets back one global jax.Array per
    leaf; single-host this is a plain sharded device_put.
    """
    if jax.process_count() > 1:
        return global_shard_batch(batch, mesh)
    def put(a):
        return jax.device_put(a, NamedSharding(
            mesh, P("data", *([None] * (a.ndim - 1)))))
    return jax.tree.map(put, batch)


def shard_batch_stacked(stack, mesh: Mesh):
    """Shard a ``(k, B, ...)``-stacked group of HOST batches over 'data'.

    The multi-step-dispatch layout (``Config.steps_per_dispatch``): the
    leading axis is the scan (step) axis and stays replicated; axis 1 is
    each step's batch, sharded exactly like :func:`shard_batch` does for
    a single batch, so every scanned step runs the same SPMD program as
    the single-step path.  Like :func:`shard_batch`, multi-host callers
    pass the stack of their LOCAL batch shards and get global arrays.
    """
    if jax.process_count() > 1:
        def put_global(a):
            a = np.asarray(a)
            sh = NamedSharding(mesh, P(None, "data",
                                       *([None] * (a.ndim - 2))))
            return jax.make_array_from_process_local_data(sh, a)
        return jax.tree.map(put_global, stack)

    def put(a):
        spec = P(None, "data", *([None] * (a.ndim - 2)))
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree.map(put, stack)


def global_shard_batch(batch, mesh: Mesh):
    """Assemble per-process local batch shards into global arrays.

    The multi-host analogue of :func:`shard_batch`
    (``jax.make_array_from_process_local_data`` over the 'data' axis) --
    the jitted step then runs one global SPMD program, so loss/metric
    reductions come back replicated and already globally aggregated.
    Single-process it produces exactly ``shard_batch``'s layout (tested).
    """
    def put(a):
        a = np.asarray(a)
        sh = NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        return jax.make_array_from_process_local_data(sh, a)
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
