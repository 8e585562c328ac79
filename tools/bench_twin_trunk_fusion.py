#!/usr/bin/env python
"""Micro A/B: two separate ResNet-18 trunks vs one vmapped twin trunk.

The flagship (Hand3DPosePriorNetwork) runs TWO architecturally identical
ExtendedResNet18 trunks (PosePrior + ViewPoint backbones) over the SAME
21-ch scoremap input (models/zoo.py:425-434; reference
PoseViewPointNetwork.py:35-93).  ``nn.vmap`` over stacked params turns
each pair of convs into ONE batched/grouped conv HLO, halving the op
count of the dominant conv-backward path (NOTES_r3.md train-step
profile: ~38% backward convs + ~52% loop fusions, spread over per-trunk
ops).  Whether fewer-but-wider HLOs are faster on v5e is an empirical
question -- vmap over conv weights lowers to grouped convolution, whose
MXU efficiency is implementation-dependent.

This script measures the trunk pair in isolation (forward and
forward+backward, BN train mode, b256 bf16, production shapes) and
checks the fused variant computes the SAME function (stacked params from
the same two trees).  Integration into the product model is only
worthwhile if this shows a clear win; either way the result is recorded
in NOTES_r3.md.

Prints one JSON line:
  {"fwd": {"separate_ms": .., "fused_ms": ..},
   "train": {"separate_ms": .., "fused_ms": ..},
   "max_abs_diff": ..}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from handpose_tpu.nn.resnet import ExtendedResNet18

BATCH = 256
ITERS = 10


def _sync(x):
    return float(np.asarray(jnp.sum(x)))


def _time(fn, *args):
    carry = fn(*args, jnp.zeros(()))          # compile
    _sync(carry)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry = fn(*args, carry)
    _sync(carry)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    kw = dict(dtype=jnp.bfloat16, stem="k3s2", bn_variance="stable",
              pool_grad="native")
    trunk = ExtendedResNet18(**kw)
    # NB: kwargs are dropped by nn.vmap -- `train` must go positionally
    TwinTrunk = nn.vmap(
        ExtendedResNet18,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        in_axes=(None, None), out_axes=0, axis_size=2)
    twin = TwinTrunk(**kw)

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (BATCH, 256, 256, 21),
                          jnp.bfloat16))
    va = trunk.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    vb = trunk.init({"params": jax.random.PRNGKey(2)}, x, train=False)
    # the fused variant must compute the SAME function: stack a/b's trees
    vt = jax.tree.map(lambda a, b: jnp.stack([a, b]), va, vb)

    # --- correctness: fused(stacked a,b) == [separate(a), separate(b)]
    sep = jnp.stack([trunk.apply(va, x, train=False),
                     trunk.apply(vb, x, train=False)])
    fus = twin.apply(vt, x, False)
    diff = float(jnp.max(jnp.abs(sep.astype(jnp.float32) -
                                 fus.astype(jnp.float32))))
    # train-mode numerics: identical in f64; in f32 they differ only by
    # reassociation of the vmapped BN batch reductions, amplified through
    # 18 normalisation layers (verified offline, NOTES_r3.md)

    # --- forward timing (eval mode, like the fused-infer bench)
    @jax.jit
    def fwd_sep(va, vb, x, carry):
        x = x + carry.astype(x.dtype) * 0
        return (jnp.sum(trunk.apply(va, x, train=False)) +
                jnp.sum(trunk.apply(vb, x, train=False))).astype(jnp.float32)

    @jax.jit
    def fwd_fus(vt, x, carry):
        x = x + carry.astype(x.dtype) * 0
        return jnp.sum(twin.apply(vt, x, False)).astype(jnp.float32)

    fwd_sep_ms = _time(fwd_sep, va, vb, x)
    fwd_fus_ms = _time(fwd_fus, vt, x)

    # --- forward+backward timing (BN train mode, params-only grads)
    def loss_sep(params, stats, x):
        out, upd = trunk.apply(
            {"params": params[0], "batch_stats": stats[0]}, x, train=True,
            mutable=["batch_stats"])
        out2, upd2 = trunk.apply(
            {"params": params[1], "batch_stats": stats[1]}, x, train=True,
            mutable=["batch_stats"])
        return (jnp.mean(out) + jnp.mean(out2)).astype(jnp.float32), \
            (upd["batch_stats"], upd2["batch_stats"])

    def loss_fus(params, stats, x):
        out, upd = twin.apply(
            {"params": params, "batch_stats": stats}, x, True,
            mutable=["batch_stats"])
        return jnp.mean(out).astype(jnp.float32), upd["batch_stats"]

    @jax.jit
    def step_sep(params, stats, x, carry):
        x = x + carry.astype(x.dtype) * 0
        (l, stats), grads = jax.value_and_grad(
            loss_sep, has_aux=True)(params, stats, x)
        gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                   for g in jax.tree.leaves(grads))
        return l + gsum

    @jax.jit
    def step_fus(params, stats, x, carry):
        x = x + carry.astype(x.dtype) * 0
        (l, stats), grads = jax.value_and_grad(
            loss_fus, has_aux=True)(params, stats, x)
        gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                   for g in jax.tree.leaves(grads))
        return l + gsum

    ps, ss = (va["params"], vb["params"]), (va["batch_stats"],
                                            vb["batch_stats"])
    train_sep_ms = _time(step_sep, ps, ss, x)
    train_fus_ms = _time(step_fus, vt["params"], vt["batch_stats"], x)

    print(json.dumps({
        "fwd": {"separate_ms": round(fwd_sep_ms, 2),
                "fused_ms": round(fwd_fus_ms, 2),
                "speedup": round(fwd_sep_ms / fwd_fus_ms, 3)},
        "train": {"separate_ms": round(train_sep_ms, 2),
                  "fused_ms": round(train_fus_ms, 2),
                  "speedup": round(train_sep_ms / train_fus_ms, 3)},
        "max_abs_diff": diff,
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
