"""dp x tp sharding rules for the train state.

TPU-native replacement for the reference's (orphan) DDP template
(reference dist.py:9-52): instead of process groups, the training step is
jitted over a 2-D ("data", "model") `jax.sharding.Mesh`.  The batch is
sharded over "data" (gradient all-reduce becomes an XLA `psum` on ICI);
the wide dense/conv output channels are sharded over "model"
(tensor-parallel), which XLA turns into all-gathers/reduce-scatters on
the interconnect.  At the model sizes this framework targets pure dp is
usually fastest, but the tp layout compiles and is validated by
`dryrun_multichip` and the tp-parity test.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_tp_mesh(n_devices: int,
                    devices: Sequence | None = None,
                    tp: int | None = None) -> Mesh:
    """Mesh of shape (dp, tp).

    ``tp=None`` (default) auto-picks: tp=2 when n is an even >=4, else
    tp=1.  Pass tp explicitly to pin the layout (the scaling diagnostics
    compare dp-only vs dp x tp collective schedules this way)."""
    devices = list(devices if devices is not None else jax.devices())
    devices = devices[:n_devices]
    if len(devices) < n_devices:
        raise ValueError(
            f"need {n_devices} devices, have {len(devices)}")
    if tp is None:
        tp = 2 if (n_devices % 2 == 0 and n_devices >= 4) else 1
    if n_devices % tp != 0:
        raise ValueError(f"tp={tp} does not divide n_devices={n_devices}")
    arr = np.asarray(devices).reshape(n_devices // tp, tp)
    return Mesh(arr, ("data", "model"))


def param_sharding(mesh: Mesh, array,
                   min_width: int = 64) -> NamedSharding:
    """Tensor-parallel layout rule for one parameter array.

    Shard the output (last) dimension of large kernels over the 'model'
    axis when it divides evenly and is wide enough to be worth the
    collective; replicate everything else (biases, BN stats, small heads).
    """
    tp = mesh.shape["model"]
    if (tp > 1 and array.ndim >= 2 and array.shape[-1] % tp == 0
            and array.shape[-1] >= min_width):
        return NamedSharding(
            mesh, P(*([None] * (array.ndim - 1)), "model"))
    return NamedSharding(mesh, P())


def shard_train_state(state, mesh: Mesh, min_width: int = 64):
    """Place a TrainState on the mesh: tp-sharded params, replicated rest.

    Optimizer-state leaves that mirror a parameter's shape inherit that
    parameter's sharding (Adam m/v); scalars and batch stats replicate.
    """
    params = jax.tree.map(
        lambda a: jax.device_put(a, param_sharding(mesh, a, min_width)),
        state.params)
    repl = NamedSharding(mesh, P())

    def opt_leaf(a):
        return jax.device_put(a, param_sharding(mesh, a, min_width)
                              if hasattr(a, "ndim") and a.ndim >= 2
                              else repl)

    kwargs = dict(
        params=params,
        opt_state=jax.tree.map(opt_leaf, state.opt_state))
    if getattr(state, "batch_stats", None) is not None:
        kwargs["batch_stats"] = jax.tree.map(
            lambda a: jax.device_put(a, repl), state.batch_stats)
    return state.replace(**kwargs)
