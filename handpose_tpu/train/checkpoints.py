"""Checkpointing with the reference's filtered-resume/finetune semantics.

TPU-native equivalent of reference trainval.py:163-212 + 589-596:
* each save writes ``{epoch, params, batch_stats, opt_state, best_mpjpe}``
  as ``checkpoint`` (last) and, on best val MPJPE, ``model_best``;
* resume loads the stored params, keeps only keys that exist in the current
  model with matching shapes (``strict=False`` analogue), and infers
  *resume* vs *finetune* by key-set equality -- optimizer state, epoch and
  best metric are only restored on an exact match.

Uses orbax-checkpoint; trees are restored without a target and merged by
flattened key paths so partially-matching architectures load cleanly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_LAST = "checkpoint"
CKPT_BEST = "model_best"


def _flatten(tree, prefix=()) -> Dict[tuple, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[tuple, Any]):
    root: dict = {}
    for path, v in flat.items():
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return root


def save_checkpoint(run_dir: str, state, epoch: int, best_mpjpe: float,
                    is_best: bool) -> None:
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "epoch": np.int32(epoch),
        "best_mpjpe": np.float32(best_mpjpe),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    ckptr.save(os.path.join(run_dir, CKPT_LAST), payload, force=True)
    if is_best:
        ckptr.save(os.path.join(run_dir, CKPT_BEST), payload, force=True)


def load_raw(path: str):
    return ocp.PyTreeCheckpointer().restore(path)


def _place_like(new_tree, like_tree):
    """Put each restored leaf back with the LIVE leaf's device sharding.

    The Worker replicates/shards TrainState over the mesh before calling
    resume; rebuilding leaves with a bare jnp.asarray would silently drop
    that layout (single-device arrays fed to the global SPMD step).
    Shape mismatches raise so callers can fall back loudly.
    """
    def put(new, like):
        a = np.asarray(new)
        if hasattr(like, "shape") and tuple(a.shape) != tuple(like.shape):
            raise ValueError(
                f"restored leaf shape {a.shape} != live {like.shape}")
        if isinstance(like, jax.Array):
            return jax.device_put(a, like.sharding)
        return jax.numpy.asarray(a)
    return jax.tree.map(put, new_tree, like_tree)


def filtered_resume(state, ckpt_path: str) -> Tuple[Any, int, float, bool]:
    """Load a checkpoint into ``state`` with the reference's semantics.

    Returns (new_state, start_epoch, best_mpjpe, is_finetune).
    """
    raw = load_raw(ckpt_path)
    cur = _flatten(jax.device_get(state.params))
    loaded = _flatten(raw["params"])
    matched = {k: v for k, v in loaded.items()
               if k in cur and np.shape(v) == np.shape(cur[k])}
    merged = dict(cur)
    merged.update(matched)
    new_params = _unflatten(merged)

    full_match = set(loaded.keys()) == set(cur.keys()) and \
        len(matched) == len(cur)
    is_finetune = not full_match

    state = state.replace(params=_place_like(new_params, state.params))
    if full_match:
        # exact architecture: restore optimizer/epoch/best like the
        # reference's "resume" branch (trainval.py:196-208)
        bs = raw.get("batch_stats")
        opt = raw.get("opt_state")
        if bs is not None and jax.tree.structure(
                bs) == jax.tree.structure(jax.device_get(state.batch_stats)):
            state = state.replace(
                batch_stats=_place_like(bs, state.batch_stats))
        if opt is not None:
            try:
                opt_restored = jax.tree.unflatten(
                    jax.tree.structure(state.opt_state),
                    jax.tree.leaves(opt))
                state = state.replace(
                    opt_state=_place_like(opt_restored, state.opt_state))
            except Exception as e:
                # a silent reset here would mean full-LR Adam with zero
                # moments mid-cosine-decay and nobody knowing why
                print("WARNING: optimizer-state restore failed "
                      f"({type(e).__name__}: {e}); resuming epoch/params "
                      "but with a FRESH optimizer (moments and schedule "
                      "count reset)")
        return (state, int(raw.get("epoch", 0)),
                float(raw.get("best_mpjpe", np.inf)), False)
    return state, 0, float(np.inf), True


def reconcile_schedule_count(state, start_epoch: int, steps_per_epoch: int):
    """Pin the LR schedule's step counter to the resumed epoch boundary.

    ``cosine_epoch_schedule`` derives the LR epoch as
    ``count // steps_per_epoch`` of the RESUMING run.  A restored
    optimizer count came from the run that WROTE the checkpoint, whose
    steps_per_epoch may differ (different batch size, a migrated torch
    run, a preemption mid-epoch) — trusting it silently resumes at the
    wrong point on the cosine curve (possibly clamped to eta_min).  Set
    the schedule counter to ``start_epoch * steps_per_epoch`` so epoch
    ``start_epoch`` trains at exactly the LR the reference's per-epoch
    ``scheduler.step()`` would give it (trainval.py:376).  Adam's own
    count (bias correction) is left at the true number of steps taken —
    only LR-schedule components (chain index > 0) are touched.
    """
    import jax.numpy as jnp

    target = jnp.asarray(start_epoch * steps_per_epoch, jnp.int32)
    new = list(state.opt_state)
    for i in range(1, len(new)):
        if hasattr(new[i], "count") and hasattr(new[i], "_replace"):
            new[i] = new[i]._replace(count=target)
    return state.replace(opt_state=tuple(new))
