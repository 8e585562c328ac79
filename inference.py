#!/usr/bin/env python
"""Inference / evaluation entry point (reference inference.py, un-bit-rotted).

Loads a checkpoint, evaluates visible-joint MPJPE over the eval split with
exact whole-epoch aggregation (the reference averaged only the last batch,
inference.py:241-242), and optionally renders predicted-vs-GT overlays.

The model can be named explicitly or derived from the checkpoint path's
logs/<model>/<dataset>/run_x/ layout like the reference (inference.py:38).
"""

import argparse

from handpose_tpu.config import Config, MODEL_NAMES, \
    apply_overrides
from handpose_tpu.infer import Evaluator, model_name_from_path




def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (orbax) to load")
    p.add_argument("--model", default=None, choices=MODEL_NAMES)
    # None defaults make "explicitly passed" detectable for --from_run
    # precedence; effective defaults are filled below
    p.add_argument("--dataset", default=None,
                   choices=["RHD", "InterHand2.6M", "synthetic"],
                   help="default RHD")
    p.add_argument("--data_root", default=None, help="default /data/RHD")
    p.add_argument("--batch_size", type=int, default=None,
                   help="default 100")
    p.add_argument("--input_channels", type=int, default=None)
    p.add_argument("--visualize_dir", default=None)
    p.add_argument("--visualize_n", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--pck", action="store_true",
                   help="also report the PCK curve + 20-50mm AUC")
    p.add_argument("--export", default=None, metavar="PATH",
                   help="serialize the loaded model's forward (weights "
                        "baked in) as a jax.export artifact and exit")
    p.add_argument("--export_batch", type=int, default=1)
    p.add_argument("--from_run", default=None, metavar="RUN_DIR",
                   help="rehydrate the full Config from RUN_DIR/config.json; "
                        "--ckpt defaults to RUN_DIR/model_best (falling "
                        "back to the last checkpoint)")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   dest="overrides",
                   help="override any Config field, e.g. --set sigma=10")
    args = p.parse_args()

    if args.from_run:
        import os
        with open(os.path.join(args.from_run, "config.json")) as f:
            cfg = Config.from_json(f.read())
        ckpt = args.ckpt
        if ckpt is None:
            for name in ("model_best", "checkpoint"):
                cand = os.path.join(args.from_run, name)
                if os.path.isdir(cand):
                    ckpt = cand
                    break
            if ckpt is None:
                # never silently evaluate random weights
                raise SystemExit(
                    f"--from_run: no model_best/checkpoint dir under "
                    f"{args.from_run}; pass --ckpt explicitly")
        cfg = cfg.replace(infer_resume_weight_path=ckpt)
        # dataset flags given explicitly on the command line beat the
        # rehydrated run config (the run was trained elsewhere; the data
        # lives here); None = not passed, so even a value equal to the
        # usual default counts as explicit
        explicit = {}
        if args.data_root is not None:
            explicit["dataset_root_dir"] = args.data_root
        if args.dataset is not None:
            explicit["dataset_name"] = args.dataset
        if args.batch_size is not None:
            explicit["infer_batch_size"] = args.batch_size
        if explicit:
            cfg = cfg.replace(**explicit)
        cfg = apply_overrides(cfg, args.overrides)
        _evaluate(args, cfg, ckpt)
        return

    model = args.model
    if model is None and args.ckpt:
        model = model_name_from_path(args.ckpt)
    if model is None:
        model = "Hand3DPosePriorNetwork"
    in_ch = args.input_channels
    if in_ch is None:
        in_ch = {"Hand3DPosePriorNetwork": 21,
                 "ThreeHandShapeAndPoseMANO": 24,
                 "Resnet50MANO3DHandPose": 24}.get(model, 3)

    cfg = Config(model_name=model,
                 dataset_name=args.dataset if args.dataset is not None
                 else "RHD",
                 dataset_root_dir=args.data_root if args.data_root
                 is not None else "/data/RHD",
                 infer_batch_size=args.batch_size if args.batch_size
                 is not None else 100,
                 input_channels=in_ch,
                 infer_resume_weight_path=args.ckpt)
    cfg = apply_overrides(cfg, args.overrides)
    _evaluate(args, cfg, args.ckpt)


def _evaluate(args, cfg, ckpt):
    ev = Evaluator(cfg, ckpt_path=ckpt,
                   visualize_dir=args.visualize_dir)
    if args.export:
        from handpose_tpu.infer.export import export_forward, save_exported

        variables = {"params": ev.state.params,
                     "batch_stats": ev.state.batch_stats}
        blob = export_forward(cfg, variables, args.export_batch)
        save_exported(args.export, blob)
        print(f"exported {len(blob)} bytes to {args.export}")
        return
    if args.pck:
        res = ev.evaluate_full(max_batches=args.max_batches)
        print(f"visible-joint MPJPE: {res['mpjpe']:.5f} mm")
        print(f"AUC (20-50mm): {res['auc_20_50mm']:.4f}")
        for t, v in zip(res["pck_thresholds"][::6], res["pck"][::6]):
            print(f"  PCK@{t * 1000:.0f}mm: {v:.4f}")
    else:
        mpjpe = ev.evaluate(max_batches=args.max_batches,
                            visualize_first_n=args.visualize_n
                            if args.visualize_dir else 0)
        print(f"visible-joint MPJPE: {mpjpe:.5f} mm")


if __name__ == "__main__":
    main()
