#!/usr/bin/env python
"""Training entry point (reference trainval.py / trainval_hand3DPose.py).

One CLI covers both reference trainers -- the trainer-B models
(Hand3DPoseNet / Hand3DPosePriorNetwork) switch loss/eval paths
automatically.  Flags mirror the reference (`--fast_debug`) plus explicit
overrides for what the reference hardcoded in config.py.

Examples:
  python trainval.py --model OnlyThreeDimHandPose --fake_data --fast_debug
  python trainval.py --model Hand3DPosePriorNetwork \
      --dataset RHD --data_root /data/RHD --batch_size 200
"""

import argparse

from handpose_tpu.config import Config, MODEL_NAMES, \
    apply_overrides
from handpose_tpu.train import Worker




def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="Hand3DPosePriorNetwork",
                   choices=MODEL_NAMES)
    # dataset/path flags default to None so "explicitly passed" is
    # detectable (--from_run precedence); effective defaults in _DEFAULTS
    p.add_argument("--dataset", default=None,
                   choices=["RHD", "InterHand2.6M", "synthetic"],
                   help="default RHD")
    p.add_argument("--data_root", default=None, help="default /data/RHD")
    p.add_argument("--batch_size", type=int, default=None,
                   help="default 200")
    p.add_argument("--input_channels", type=int, default=None,
                   help="3 | 21 | 24 (default: per-model convention)")
    p.add_argument("--max_epoch", type=int, default=None,
                   help="default 60")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--fast_debug", action="store_true",
                   help="truncate every epoch to 3 iterations "
                        "(reference trainval.py:271-272)")
    p.add_argument("--fake_data", action="store_true",
                   help="synthetic half-bright image + fixed GT pose "
                        "(reference trainval_fake)")
    p.add_argument("--use_val_to_debug", action="store_true")
    p.add_argument("--resume", default=None)
    p.add_argument("--log_dir", default=None, help="default logs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--from_run", default=None, metavar="RUN_DIR",
                   help="rehydrate the full Config from RUN_DIR/config.json "
                        "(the provenance snapshot every run writes); "
                        "explicitly passed dataset/path flags and "
                        "--resume/--set/--log_dir still apply on top")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   dest="overrides",
                   help="override any Config field, e.g. --set sigma=10")
    args = p.parse_args()

    if args.from_run:
        import os
        with open(os.path.join(args.from_run, "config.json")) as f:
            cfg = Config.from_json(f.read())
        if args.resume:
            cfg = cfg.replace(resume_weight_path=args.resume)
        # dataset/path flags given explicitly beat the rehydrated config
        # (a migrated/foreign run's config points at data that lives
        # elsewhere); None = not passed, so even a value equal to the
        # usual default counts as explicit
        explicit = {}
        for flag, field in (("data_root", "dataset_root_dir"),
                            ("dataset", "dataset_name"),
                            ("batch_size", "batch_size"),
                            ("max_epoch", "max_epoch"),
                            ("log_dir", "save_log_dir")):
            v = getattr(args, flag)
            if v is not None:
                explicit[field] = v
        if args.use_val_to_debug:
            explicit["use_val_dataset_to_debug"] = True
        if args.fake_data:
            explicit["use_fake_data"] = True
        if explicit:
            cfg = cfg.replace(**explicit)
        cfg = apply_overrides(cfg, args.overrides)
        worker = Worker(cfg)
        worker.enable_preemption_save()
        best = worker.run(fast_debug=args.fast_debug)
        print(f"best val MPJPE: {best:.5f}")
        return

    # per-model default input channels (reference config.py:44 conventions)
    in_ch = args.input_channels
    if in_ch is None:
        in_ch = {"Hand3DPosePriorNetwork": 21,
                 "ThreeHandShapeAndPoseMANO": 24,
                 "Resnet50MANO3DHandPose": 24}.get(args.model, 3)

    dataset = args.dataset if args.dataset is not None else "RHD"
    cfg = Config(
        model_name=args.model,
        dataset_name="synthetic" if args.fake_data else dataset,
        dataset_root_dir=args.data_root if args.data_root is not None
        else "/data/RHD",
        batch_size=args.batch_size if args.batch_size is not None else 200,
        input_channels=in_ch,
        max_epoch=args.max_epoch if args.max_epoch is not None else 60,
        lr=args.lr,
        use_fake_data=args.fake_data,
        use_val_dataset_to_debug=args.use_val_to_debug,
        resume_weight_path=args.resume,
        save_log_dir=args.log_dir if args.log_dir is not None else "logs",
        seed=args.seed,
    )
    cfg = apply_overrides(cfg, args.overrides)
    worker = Worker(cfg)
    # SIGTERM (fleet preemption) -> checkpoint at the next step boundary
    # and exit cleanly; resume restarts the interrupted epoch
    worker.enable_preemption_save()
    best = worker.run(fast_debug=args.fast_debug)
    print(f"best val MPJPE: {best:.5f}")


if __name__ == "__main__":
    main()
