#!/usr/bin/env python
"""Serving demo: checkpoint -> StableHLO artifact -> standalone predict.

Shows the deployment path the reference does not have (its inference.py
needs the whole framework + checkpoint plumbing in the serving process):

  1. load a trained run (or use a fresh init with --fresh),
  2. export the fused inference forward -- weights baked in -- as one
     portable `jax.export` artifact,
  3. reload the artifact WITHOUT the model zoo / config / checkpoint
     machinery and predict on a batch of images.

Usage:
  python examples/serving_demo.py --fresh                 # no run needed
  python examples/serving_demo.py --from_run logs/<m>/<d>/run_x \
      --out /tmp/hand.stablehlo
"""

import argparse
import os
import sys

_here = globals().get("__file__", os.path.join(os.getcwd(), "examples", "x"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(_here))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from_run", default=None,
                    help="run dir with config.json + model_best/checkpoint")
    ap.add_argument("--fresh", action="store_true",
                    help="demo with a fresh init instead of a trained run")
    ap.add_argument("--out", default="/tmp/handpose_forward.stablehlo")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--fused", action="store_true",
                    help="export the fused raw->preprocess->forward "
                         "pipeline (RHD-format raw inputs) instead of "
                         "the model forward alone")
    args = ap.parse_args()

    import jax
    import numpy as np

    from handpose_tpu.config import Config
    from handpose_tpu.data.synthetic import fake_sample_batch
    from handpose_tpu.data.preprocess import model_input
    from handpose_tpu.infer.export import (export_forward, load_exported_file,
                                           save_exported)
    from handpose_tpu.models import build_model

    if args.fresh:
        cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                     input_img_shape=(128, 128), resnet_out_feature_dim=256)
    elif args.from_run:
        with open(os.path.join(args.from_run, "config.json")) as f:
            cfg = Config.from_json(f.read())
    else:
        ap.error("pass --fresh or --from_run <dir>")

    model = build_model(cfg, is_inference=True)
    warm = fake_sample_batch(args.batch_size, cfg.crop_size,
                             cfg.input_channels, seed=0)
    inp = model_input(warm, cfg.input_channels)

    if args.fresh:
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, inp,
            warm["camera_intrinsic_matrix"], warm["keypoint_scale"],
            warm["keypoint_xyz_root"], train=False)
    else:
        # pull the trained params/batch_stats through the production
        # resume path (model_best preferred, falling back to last);
        # create_train_state performs the (single) model.init trace
        from handpose_tpu.train.checkpoints import filtered_resume
        from handpose_tpu.train.state import create_train_state

        pose_x0 = warm["keypoint_xyz21_rel_normed"].reshape(
            args.batch_size, 1, -1)
        state = create_train_state(
            model, cfg, (inp, warm["camera_intrinsic_matrix"],
                         warm["keypoint_scale"], warm["keypoint_xyz_root"],
                         pose_x0), jax.random.PRNGKey(cfg.seed))
        for name in ("model_best", "checkpoint"):
            cand = os.path.join(args.from_run, name)
            if os.path.isdir(cand):
                state, _, _, is_finetune = filtered_resume(state, cand)
                if is_finetune:
                    # partial key match means part of the exported weights
                    # would be fresh init -- never what serving wants
                    ap.error(f"{cand} only partially matches the model "
                             f"built from {args.from_run}/config.json "
                             "(finetune-style load); refusing to export "
                             "partially-initialised weights")
                break
        else:
            ap.error(f"no model_best/checkpoint dir under {args.from_run}")
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    if args.fused:
        # whole-pipeline artifact: raw uint8 sample in, joints out --
        # the exact program the throughput/b1 benches measure
        from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
        from handpose_tpu.infer.export import (export_fused_pipeline,
                                               load_exported_pipeline)

        root = "/tmp/hpt_serving_demo_rhd"
        if not os.path.exists(os.path.join(
                root, "evaluation", "anno_evaluation.pickle")):
            write_synthetic_rhd(root, "evaluation",
                                max(8, args.batch_size))
        ds = RHDDataset(root, "evaluation")
        raw = ds.raw_batch(list(range(args.batch_size)))
        S = raw.image.shape[1:3]
        blob = export_fused_pipeline(cfg, variables, args.batch_size,
                                     image_size=S)
        save_exported(args.out, blob)
        print(f"exported fused pipeline {len(blob) / 1e6:.1f} MB -> "
              f"{args.out}")
        with open(args.out, "rb") as f:
            fn = load_exported_pipeline(f.read())
        xyz, uv = fn(raw.image, raw.mask, raw.keypoint_uv,
                     np.asarray(raw.keypoint_vis, np.float32),
                     raw.keypoint_xyz, raw.camera_K)
        print("xyz", xyz.shape, "uv", uv.shape,
              "| first joint:", np.asarray(xyz)[0, 0])
        return

    # 1 -> 2: export (weights closed over; deterministic rngs)
    blob = export_forward(cfg, variables, args.batch_size)
    save_exported(args.out, blob)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {args.out}")

    # 3: a 'serving process': only the artifact file + jax arrays
    fn = load_exported_file(args.out)
    batch = fake_sample_batch(args.batch_size, cfg.crop_size,
                              cfg.input_channels, seed=1)
    img = np.asarray(model_input(batch, cfg.input_channels))
    xyz, uv = fn(img, batch["camera_intrinsic_matrix"],
                 batch["keypoint_scale"], batch["keypoint_xyz_root"])
    print("xyz", xyz.shape, "uv", uv.shape,
          "| first joint:", np.asarray(xyz)[0, 0])


if __name__ == "__main__":
    main()
