"""Inference / evaluation harness.

TPU-native rebuild of reference inference.py (which is bit-rotted: stale
imports at inference.py:23-29 and a last-batch-only MPJPE at :241-242 --
both fixed here).  Loads a checkpoint, runs the eval split through the
device-side preprocessing + jitted eval step, aggregates MPJPE exactly
over every visible joint of the epoch, and optionally renders
predicted-vs-GT keypoint overlays.

The reference derives the model name from the checkpoint path's 4th-last
segment (inference.py:38); :func:`model_name_from_path` keeps that
convenience, but an explicit config always wins.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import numpy as np

from ..config import Config
from ..data.pipeline import device_batches
from ..data.preprocess import model_input
from ..data.rhd import RHDDataset
from ..data.synthetic import fake_sample_batch
from ..models import build_model
from ..train.checkpoints import filtered_resume
from ..train.state import create_train_state
from ..train.steps import make_eval_step
from ..utils.vis import plot_pred_vs_gt, save_image, to_uint8_image


def model_name_from_path(ckpt_path: str) -> str:
    """logs/<model>/<dataset>/run_xxx/<ckpt> -> <model>
    (reference inference.py:38)."""
    parts = os.path.normpath(ckpt_path).split(os.sep)
    return parts[-4] if len(parts) >= 4 else parts[0]


class Evaluator:
    def __init__(self, cfg: Config, ckpt_path: Optional[str] = None,
                 visualize_dir: Optional[str] = None):
        ckpt_path = ckpt_path or cfg.infer_resume_weight_path
        if ckpt_path == "":
            # an empty path would silently evaluate random weights
            raise ValueError("ckpt_path is empty; pass a checkpoint "
                             "directory or None for random-init eval")
        if ckpt_path and cfg.model_name is None:
            cfg = cfg.replace(model_name=model_name_from_path(ckpt_path))
        self.cfg = cfg
        if cfg.compilation_cache_dir:
            from ..utils.device_info import enable_compilation_cache
            enable_compilation_cache(cfg.compilation_cache_dir)
        self.model = build_model(cfg, is_inference=True)
        self.eval_step = make_eval_step(self.model, cfg)
        # fused serving path: raw batch -> preprocess + forward + metrics
        # in ONE program (same numbers as the separate path, parity-tested
        # in tests/test_train.py; ~2x on the non-step cost)
        self.fused = cfg.fuse_preprocess and not (
            cfg.use_fake_data or cfg.dataset_name == "synthetic")
        if self.fused:
            from ..data.preprocess import (preprocess_batch,
                                           preprocess_interhand_batch)
            from ..train.steps import make_fused_eval_step
            is_ih = cfg.dataset_name == "InterHand2.6M"
            self._pp_fn = (preprocess_interhand_batch if is_ih
                           else preprocess_batch)
            self._pp_kwargs = dict(
                crop_size=cfg.crop_size, sigma=cfg.sigma,
                switch_joint_order=cfg.joint_order_switched)
            self.fused_eval_step = make_fused_eval_step(
                self.model, cfg, self._pp_fn, self._pp_kwargs)
        self.visualize_dir = visualize_dir
        if visualize_dir:
            os.makedirs(os.path.join(visualize_dir, "img"), exist_ok=True)
        self._ds = None           # built once, reused by every evaluate()
        # evaluate_full's PCK-augmented eval step, built lazily per
        # thresholds tuple (PCK sums live INSIDE the eval step: one fused
        # forward per batch, not a second unfused pass)
        self._pck_steps: dict = {}

        # init + load
        sample = self._first_batch()
        inp = model_input(sample, cfg.input_channels)
        pose_x0 = sample["keypoint_xyz21_rel_normed"].reshape(
            inp.shape[0], 1, -1)
        args = (inp, sample["camera_intrinsic_matrix"],
                sample["keypoint_scale"], sample["keypoint_xyz_root"],
                pose_x0)
        self.state = create_train_state(self.model, cfg, args,
                                        jax.random.PRNGKey(cfg.seed))
        if ckpt_path:
            self.state, _, _, _ = filtered_resume(self.state, ckpt_path)

    def _dataset(self):
        # cached: InterHand annotation parsing is minutes of JSON work and
        # every dataset owns a decode thread pool -- rebuilding per call
        # duplicated both
        if self._ds is not None:
            return self._ds
        cfg = self.cfg
        if cfg.dataset_name == "InterHand2.6M":
            from ..data.interhand import InterHandDataset
            # pad_to="auto": one compiled program across the dataset's
            # mixed capture resolutions (same fix as the Worker)
            self._ds = InterHandDataset(cfg.dataset_root_dir,
                                        cfg.interhand_eval_split,
                                        cfg.fast_trainval, cfg.trans_test,
                                        cfg.input_img_shape,
                                        cfg.num_workers, pad_to="auto",
                                        cache_decoded=cfg.cache_decoded)
        else:
            self._ds = RHDDataset(cfg.dataset_root_dir, "evaluation",
                                  cfg.num_workers,
                                  cache_decoded=cfg.cache_decoded)
        return self._ds

    def _first_batch(self):
        cfg = self.cfg
        if cfg.use_fake_data or cfg.dataset_name == "synthetic":
            return fake_sample_batch(min(cfg.infer_batch_size, 8),
                                     cfg.crop_size, cfg.input_channels)
        ds = self._dataset()
        idx = list(range(min(cfg.infer_batch_size, len(ds))))
        from ..data.preprocess import (InterHandRawBatch, preprocess_batch,
                                       preprocess_interhand_batch)
        raw = ds.raw_batch(idx)
        fn = (preprocess_interhand_batch
              if isinstance(raw, InterHandRawBatch) else preprocess_batch)
        return fn(jax.device_put(raw), crop_size=cfg.crop_size,
                  sigma=cfg.sigma,
                  switch_joint_order=cfg.joint_order_switched)

    def _batches(self) -> Iterator[dict]:
        cfg = self.cfg
        if cfg.use_fake_data or cfg.dataset_name == "synthetic":
            for i in range(3):
                yield fake_sample_batch(min(cfg.infer_batch_size, 8),
                                        cfg.crop_size, cfg.input_channels,
                                        seed=i)
            return
        ds = self._dataset()
        # drop_remainder=False: evaluate every sample (costs one extra
        # compile for the trailing partial batch; the reference also
        # consumed the partial batch)
        yield from device_batches(
            ds.batches(cfg.infer_batch_size, shuffle=False,
                       drop_remainder=False),
            crop_size=cfg.crop_size, sigma=cfg.sigma,
            switch_joint_order=cfg.joint_order_switched,
            prefetch_depth=cfg.prefetch_depth)

    def _raw_batches(self):
        from ..data.pipeline import raw_device_batches
        ds = self._dataset()
        yield from raw_device_batches(
            ds, self.cfg.infer_batch_size, shuffle=False,
            drop_remainder=False, depth=max(self.cfg.prefetch_depth, 2))

    def evaluate(self, max_batches: Optional[int] = None,
                 visualize_first_n: int = 0) -> float:
        """Whole-epoch visible-joint MPJPE (exact aggregation)."""
        total, count = 0.0, 0.0
        rng = jax.random.PRNGKey(0)
        batches = self._raw_batches() if self.fused else self._batches()
        for bi, batch in enumerate(batches):
            if max_batches is not None and bi >= max_batches:
                break
            rng, srng = jax.random.split(rng)
            if self.fused:
                metrics = self.fused_eval_step(self.state, batch, srng)
            else:
                metrics = self.eval_step(self.state, batch, srng)
            total += float(metrics["mpjpe_sum"])
            count += float(metrics["mpjpe_count"])
            if self.visualize_dir and bi == 0 and visualize_first_n:
                sample = (self._pp_fn(batch, **self._pp_kwargs)
                          if self.fused else batch)
                self._visualize(sample, srng, visualize_first_n, bi)
        return total / count if count else self._empty_mpjpe()

    def _empty_mpjpe(self) -> float:
        """No visible joints seen: NaN, never 0.0 (a 0.0 would masquerade
        as a perfect MPJPE -- same semantics as the trainer's None,
        train/trainer.py run_epoch)."""
        import warnings
        warnings.warn("evaluation saw no visible keypoints; "
                      "MPJPE is undefined (NaN)")
        return float("nan")

    def _pck_eval_step(self, ts):
        """Eval step with PCK sums folded in, cached per thresholds tuple
        (fused when the fused path is on -- one program per batch)."""
        key = tuple(np.asarray(ts).tolist())
        if key not in self._pck_steps:
            from ..train.steps import make_eval_step as _mk, \
                make_fused_eval_step as _mkf
            if self.fused:
                step = _mkf(self.model, self.cfg, self._pp_fn,
                            self._pp_kwargs, pck_thresholds=ts)
            else:
                step = _mk(self.model, self.cfg, pck_thresholds=ts)
            self._pck_steps[key] = step
        return self._pck_steps[key]

    def evaluate_full(self, max_batches: Optional[int] = None,
                      thresholds=None) -> dict:
        """MPJPE + PCK curve + 20-50mm AUC over the eval split.

        PCK/AUC extend the reference's MPJPE-only protocol with the
        standard RHD evaluation curve (xyz-output models only).  One
        (fused) forward per batch: the PCK sums are part of the eval
        step's metrics (train/steps.py::_eval_metrics).
        """
        ts = np.asarray(thresholds if thresholds is not None
                        else np.linspace(0.02, 0.05, 31))
        step = self._pck_eval_step(ts)
        total, count = 0.0, 0.0
        pck_correct = np.zeros(ts.shape[0])
        pck_n = 0.0
        rng = jax.random.PRNGKey(0)
        batches = self._raw_batches() if self.fused else self._batches()
        for bi, batch in enumerate(batches):
            if max_batches is not None and bi >= max_batches:
                break
            rng, srng = jax.random.split(rng)
            metrics = step(self.state, batch, srng)
            total += float(metrics["mpjpe_sum"])
            count += float(metrics["mpjpe_count"])
            if "pck_correct_sum" in metrics:
                pck_correct += np.asarray(metrics["pck_correct_sum"])
                pck_n += float(metrics["pck_count"])
        curve = (pck_correct / pck_n) if pck_n else np.zeros(ts.shape[0])
        auc = (np.trapezoid(curve, ts) / (ts[-1] - ts[0])
               if pck_n else 0.0)
        return {"mpjpe": total / count if count else self._empty_mpjpe(),
                "pck_thresholds": ts, "pck": curve, "auc_20_50mm": auc}

    def _visualize(self, batch, rng, n, batch_idx):
        inp = model_input(batch, self.cfg.input_channels)
        pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(
            inp.shape[0], 1, -1)
        out = self.model.apply(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats},
            inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0,
            rngs={"diffusion": rng})
        pred_uv = np.asarray(out.uv) if out.uv is not None else None
        if pred_uv is None:
            return
        imgs = np.asarray(batch["image_crop"])
        gt_uv = np.asarray(batch["keypoint_uv21"])
        vis = np.asarray(batch["keypoint_vis21"])
        for i in range(min(n, imgs.shape[0])):
            img = plot_pred_vs_gt(to_uint8_image(imgs[i]), pred_uv[i],
                                  gt_uv[i], vis[i])
            save_image(os.path.join(self.visualize_dir, "img",
                                    f"{batch_idx:03d}_{i:03d}_pre.jpg"), img)
