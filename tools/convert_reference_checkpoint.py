#!/usr/bin/env python
"""Convert a PyTorch reference checkpoint (.pth.tar) into a handpose_tpu
run directory.

The reference trainer saves ``{epoch, state_dict, optimizer, MPJPE}``
(reference trainval.py:618-623, save_checkpoint :589-596).  This tool
maps it onto our Orbax layout so a reference user can continue or
evaluate an existing torch run on TPU:

* ``state_dict`` -> Flax ``params`` + ``batch_stats`` via the same
  per-family weight-transfer mapping the parity tests pin
  (tests/test_model_transfer_parity.py), with the reference's own
  filtered ``strict=False`` load semantics (trainval.py:171-192):
  matching keys load, a key-set mismatch flags *finetune* and drops
  epoch/optimizer carry-over.
* ``optimizer`` -> the optax Adam state: torch ``exp_avg``/
  ``exp_avg_sq`` become ``mu``/``nu`` (routed through the identical
  transfer mapping, so every moment lands on its matching leaf) and
  ``step`` becomes ``count`` — twin-training parity
  (tools/twin_train_parity.py) is the evidence that torch.optim.Adam
  and optax.adam then continue along the same trajectory.
* ``epoch``/``MPJPE`` -> the checkpoint's ``epoch``/``best_mpjpe``.

The output directory contains ``config.json`` + ``checkpoint`` +
``model_best``, i.e. it looks like one of our run dirs:
``python inference.py --from_run <out>`` and
``python trainval.py --set resume_weight_path=<out>/checkpoint`` work
directly.

Requires torch and the mounted reference repo (the torch module is
reconstructed to host the state_dict during transfer) — a one-off
migration-time dependency, not a runtime one.

Usage:
  python tools/convert_reference_checkpoint.py \
      --ckpt DF_model_best.pth.tar --model ThreeDimHandPose \
      --out /runs/migrated [--feat-dim 256] [--no-optimizer]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests"),
          os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)


def _transfer_fn(model_name: str):
    import test_model_transfer_parity as xfer

    return {
        "ThreeDimHandPose": xfer.transfer_threedimhandpose,
        "OnlyThreeDimHandPose": xfer.transfer_onlythreedimhandpose,
        "TwoDimHandPose": xfer.transfer_twodimhandpose,
        "TwoDimHandPoseWithFK": xfer.transfer_twodimhandposewithfk,
        "MANO3DHandPose": xfer.transfer_mano3dhandpose,
        "ThreeHandShapeAndPoseMANO": xfer.transfer_threehandshapeandpose,
        "Resnet50MANO3DHandPose": xfer.transfer_resnet50mano,
        "DiffusionHandPose": xfer.transfer_diffusionhandpose,
        "Hand3DPoseNet": xfer.transfer_hand3dposenet,
        "Hand3DPosePriorNetwork": xfer.transfer_flagship,
    }.get(model_name)


def _moments_as_params(tm, transfer, opt_sd, field):
    """Load each torch parameter's Adam moment tensor INTO the parameter
    storage and rerun the weight-transfer mapping: the resulting params
    tree is the optax ``mu``/``nu`` tree, with every moment on the leaf
    its parameter maps to.  The torch optimizer state is keyed by
    position in ``param_groups[0]['params']``, which the reference
    builds straight from ``model.parameters()`` (trainval.py:119)."""
    import torch

    ids = opt_sd["param_groups"][0]["params"]
    st = opt_sd["state"]
    with torch.no_grad():
        for i, p in zip(ids, tm.parameters()):
            ent = st.get(i)
            m = (ent.get(field) if isinstance(ent, dict) else None)
            p.copy_(m if m is not None else torch.zeros_like(p))
    tree, _ = transfer(tm)
    return tree


def convert(ckpt_path: str, model_name: str, out_dir: str,
            feat_dim: int = 1024, with_optimizer: bool = True,
            overrides=None, cond_dim: int = 256) -> dict:
    """Convert; returns a small summary dict (also printed by main)."""
    import jax
    import jax.numpy as jnp
    import torch

    from handpose_tpu.config import apply_overrides
    from handpose_tpu.train.checkpoints import save_checkpoint
    from handpose_tpu.train.state import TrainState, make_optimizer
    from twin_train_parity import build_pair

    transfer = _transfer_fn(model_name)
    if transfer is None:
        raise SystemExit(
            f"no transfer mapping for {model_name!r}; all ten reference "
            "model families are supported -- check the spelling")

    ckpt = torch.load(ckpt_path, map_location="cpu")
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt

    # reference production defaults for the diffusion schedules and
    # conditioning width (reference config.py:56-58: num_timesteps=400,
    # num_sampling_timesteps=200, condition_feat_dim=256) so a real
    # checkpoint's buffers shape-match
    tm, model, _, _, cfg = build_pair(model_name, feat_dim,
                                      diff_T=400, diff_sampling=200,
                                      cond_dim=cond_dim)
    # the harness pins compute_dtype=float32 (torch semantics for the
    # parity runs); apply any user --set overrides (e.g. a TPU serving
    # run wants compute_dtype=bfloat16) before the config is snapshotted
    if overrides:
        cfg = apply_overrides(cfg, list(overrides))

    # the reference's own filtered strict=False load + finetune
    # detection (trainval.py:171-192)
    own = tm.state_dict()
    matched = {k: v for k, v in sd.items()
               if k in own and tuple(v.shape) == tuple(own[k].shape)}
    tm.load_state_dict(matched, strict=False)
    finetune = set(sd.keys()) != set(own.keys()) or \
        len(matched) != len(own)
    if finetune:
        # loud: a shape/key mismatch silently downgrades to finetune
        # (random init for the unmatched layers, no epoch/optimizer
        # carry) -- usually a wrong --feat-dim/--cond-dim
        unmatched = sorted(set(own) - set(matched))[:5]
        print(f"WARNING: FINETUNE conversion -- {len(matched)}/{len(own)} "
              f"keys matched; unmatched e.g. {unmatched}. If this "
              "checkpoint should resume exactly, re-check --feat-dim "
              "(reference default 1024) / --cond-dim (256).",
              file=sys.stderr)

    params, stats = transfer(tm)
    from twin_train_parity import deep_copy_tree as deep
    tx = make_optimizer(cfg.lr, cfg.lr_min, cfg.max_epoch, 1)
    state = TrainState.create(apply_fn=model.apply, params=deep(params),
                              tx=tx, batch_stats=deep(stats))

    carried_opt = False
    if with_optimizer and not finetune and ckpt.get("optimizer"):
        opt_sd = ckpt["optimizer"]
        try:
            mu = deep(_moments_as_params(tm, transfer, opt_sd, "exp_avg"))
            nu = deep(_moments_as_params(tm, transfer, opt_sd,
                                         "exp_avg_sq"))
            steps = [int(e["step"]) for e in opt_sd["state"].values()
                     if isinstance(e, dict) and "step" in e]
            count = jnp.asarray(max(steps) if steps else 0, jnp.int32)
            # optax.adam = chain(scale_by_adam, scale_by_learning_rate):
            # the first count is Adam's bias correction (must be the
            # true torch step count); the second is the LR schedule's,
            # which the Worker re-pins to start_epoch*steps_per_epoch at
            # resume (checkpoints.reconcile_schedule_count) because the
            # torch run's steps_per_epoch need not match the resuming
            # run's
            adam = state.opt_state[0]._replace(count=count, mu=mu, nu=nu)
            sched = state.opt_state[1]
            if hasattr(sched, "count"):
                sched = sched._replace(count=count)
            state = state.replace(
                opt_state=(adam, sched) + tuple(state.opt_state[2:]))
            carried_opt = True
        except Exception as e:
            print(f"WARNING: optimizer carry-over failed "
                  f"({type(e).__name__}: {e}); writing a FRESH optimizer "
                  "(zero moments)")

    epoch = 0 if finetune else int(ckpt.get("epoch", 0))
    mpjpe = ckpt.get("MPJPE")
    best = float(mpjpe) if (mpjpe is not None and not finetune) \
        else float(np.inf)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    save_checkpoint(out_dir, state, epoch=epoch, best_mpjpe=best,
                    is_best=True)
    return {"out": out_dir, "model": model_name, "finetune": finetune,
            "epoch": epoch, "best_mpjpe": best,
            "optimizer_carried": carried_opt,
            "params_matched": len(matched), "params_total": len(own)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="reference .pth.tar (or bare state_dict .pth)")
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", required=True,
                    help="output run dir (config.json + checkpoint + "
                         "model_best)")
    ap.add_argument("--feat-dim", type=int, default=1024,
                    help="resnet_out_feature_dim the checkpoint was "
                         "trained with (reference config.py:52 default "
                         "1024)")
    ap.add_argument("--cond-dim", type=int, default=256,
                    help="condition_feat_dim for DiffusionHandPose "
                         "checkpoints (reference config.py:56 default "
                         "256)")
    ap.add_argument("--no-optimizer", action="store_true",
                    help="skip Adam moment carry-over")
    ap.add_argument("--set", action="append", metavar="KEY=VALUE",
                    dest="overrides",
                    help="override any Config field in the written "
                         "config.json, e.g. --set compute_dtype=bfloat16")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    res = convert(args.ckpt, args.model, args.out, feat_dim=args.feat_dim,
                  with_optimizer=not args.no_optimizer,
                  overrides=args.overrides, cond_dim=args.cond_dim)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
