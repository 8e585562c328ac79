"""The training harness (Worker equivalent).

TPU-native rebuild of the reference's two epoch-loop trainers
(trainval.py `Worker`, trainval_hand3DPose.py `Worker`): model registry +
loss gating from config, Adam + per-epoch cosine schedule, jitted
train/eval steps over a batch-sharded device mesh, TensorBoard + log.txt,
Orbax best/last checkpoints with filtered-resume/finetune detection, and
first-class fake-data and fast_debug modes.

One harness covers both reference trainers: the trainer-B loss/eval paths
(Hand3DPoseNet / Hand3DPosePriorNetwork) are selected by model name inside
the step functions (see train/steps.py).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.preprocess import model_input
from ..data.pipeline import device_batches, raw_device_batches
from ..data.rhd import RHDDataset
from ..data.synthetic import fake_sample_batch
from ..models import build_model
from ..parallel.mesh import (make_mesh, replicate, shard_batch,
                             shard_batch_stacked)
from ..utils.logging import NullLogger, RunLogger, StepStats, make_run_dir
from .checkpoints import filtered_resume, reconcile_schedule_count, \
    save_checkpoint
from .preemption import PreemptionGuard
from .state import create_train_state
from .steps import (make_eval_step, make_fused_eval_step,
                    make_fused_train_step, make_train_step)


class Worker:
    """Epoch-loop trainer (reference trainval.py:51-630)."""

    def __init__(self, cfg: Config, run_dir: Optional[str] = None,
                 mesh=None):
        self.cfg = cfg
        if cfg.scale_to_size or cfg.random_crop_to_size:
            # both terminal transforms REPLACE the sample dict with a
            # reduced one that cannot feed any model (the reference trainer
            # KeyErrors the same way, dataloaderRHD.py:464-512); they are
            # dataset/pipeline capabilities -- use preprocess_batch /
            # device_batches directly.
            raise ValueError(
                "scale_to_size / random_crop_to_size produce reduced "
                "dataset outputs incompatible with training; use the data "
                "pipeline directly")
        if cfg.debug_nans:
            # traps the first op producing a NaN (SURVEY.md §5: the
            # sanitizer the reference lacked)
            jax.config.update("jax_debug_nans", True)
        if cfg.compilation_cache_dir:
            from ..utils.device_info import enable_compilation_cache
            enable_compilation_cache(cfg.compilation_cache_dir)
        self.mesh = mesh if mesh is not None else make_mesh(
            shape=cfg.mesh_shape, axis_names=cfg.mesh_axis_names)
        self.model = build_model(cfg)
        self.train_step = make_train_step(self.model, cfg)
        self.eval_step = make_eval_step(self.model, cfg)
        self.multi_step = None   # set below iff steps_per_dispatch > 1
        self.fused = cfg.fuse_preprocess and not (
            cfg.use_fake_data or cfg.dataset_name == "synthetic")

        # datasets
        if cfg.use_fake_data or cfg.dataset_name == "synthetic":
            self.train_ds = None
            self.val_ds = None
            self.steps_per_epoch = 10
        elif cfg.dataset_name == "RHD":
            train_split = ("evaluation" if cfg.use_val_dataset_to_debug
                           else "training")
            self.train_ds = RHDDataset(cfg.dataset_root_dir, train_split,
                                       cfg.num_workers,
                                       cache_decoded=cfg.cache_decoded)
            self.val_ds = RHDDataset(cfg.dataset_root_dir, "evaluation",
                                     cfg.num_workers,
                                     cache_decoded=cfg.cache_decoded)
            self.steps_per_epoch = max(len(self.train_ds) // cfg.batch_size, 1)
        elif cfg.dataset_name == "InterHand2.6M":
            from ..data.interhand import InterHandDataset
            # pad_to="auto": real captures vary in resolution; a fixed
            # padded shape keeps ONE compiled preprocessing program instead
            # of retracing (or OOMing the compile cache) per resolution
            self.train_ds = InterHandDataset(
                cfg.dataset_root_dir, "train", cfg.fast_trainval,
                cfg.trans_test, cfg.input_img_shape, cfg.num_workers,
                pad_to="auto", cache_decoded=cfg.cache_decoded)
            self.val_ds = InterHandDataset(
                cfg.dataset_root_dir, "val", cfg.fast_trainval,
                cfg.trans_test, cfg.input_img_shape, cfg.num_workers,
                pad_to="auto", cache_decoded=cfg.cache_decoded)
            self.steps_per_epoch = max(len(self.train_ds) // cfg.batch_size, 1)
        else:
            raise ValueError(f"dataset {cfg.dataset_name} not supported here")

        if self.fused:
            # preprocessing runs INSIDE the train/eval programs (one XLA
            # program per step: ~2x faster than separate preprocess +
            # step programs, see steps.make_fused_train_step)
            from ..data.preprocess import (preprocess_batch,
                                           preprocess_interhand_batch)
            is_ih = cfg.dataset_name == "InterHand2.6M"
            pp_fn = preprocess_interhand_batch if is_ih else preprocess_batch
            pp_kwargs = dict(crop_size=cfg.crop_size, sigma=cfg.sigma,
                             switch_joint_order=cfg.joint_order_switched)
            # InterHand's aug surface is the two flags its reference loader
            # applies (dataloaderInterHand2M6.py:317-318,549-552); RHD has
            # the full set (dataloaderRHD.py flags)
            aug = dict(coord_uv_noise=cfg.coord_uv_noise,
                       scoremap_dropout=cfg.scoremap_dropout) if is_ih \
                else dict(
                coord_uv_noise=cfg.coord_uv_noise,
                crop_center_noise=cfg.crop_center_noise,
                crop_scale_noise=cfg.crop_scale_noise,
                crop_offset_noise=cfg.crop_offset_noise,
                scoremap_dropout=cfg.scoremap_dropout,
                hue_aug=cfg.hue_aug)
            self.train_step = make_fused_train_step(
                self.model, cfg, pp_fn, pp_kwargs, aug)
            self.eval_step = make_fused_eval_step(
                self.model, cfg, pp_fn, pp_kwargs)
            if cfg.steps_per_dispatch > 1:
                # k steps per host dispatch (lax.scan over stacked raw
                # batches); the single-step program above still runs
                # epoch tails that don't fill a group
                from .steps import make_fused_multi_step
                self.multi_step = make_fused_multi_step(
                    self.model, cfg, pp_fn, pp_kwargs, aug)
        if cfg.steps_per_dispatch > 1 and not self.fused:
            if not cfg.fuse_preprocess:
                raise ValueError(
                    "steps_per_dispatch > 1 (the default is 8) requires "
                    "fuse_preprocess=True -- the multi-step scan consumes "
                    "raw device batches; pass --set steps_per_dispatch=1 "
                    "alongside fuse_preprocess=False")
            # fused is off because the dataset path is fake/synthetic
            # (no raw batches to stack): dispatch grouping silently
            # degrades to single-step (multi_step stays None)

        # init state from one sample batch
        rng = jax.random.PRNGKey(cfg.seed)
        sample = self._sample_batch(seed=cfg.seed)
        inp = model_input(sample, cfg.input_channels)
        pose_x0 = sample["keypoint_xyz21_rel_normed"].reshape(
            inp.shape[0], 1, -1)
        args = (inp, sample["camera_intrinsic_matrix"],
                sample["keypoint_scale"], sample["keypoint_xyz_root"],
                pose_x0)
        self.state = create_train_state(self.model, cfg, args, rng,
                                        self.steps_per_epoch)
        self.state = self.state.replace(
            params=replicate(self.state.params, self.mesh),
            batch_stats=replicate(self.state.batch_stats, self.mesh),
            opt_state=replicate(self.state.opt_state, self.mesh))

        # multi-host: only the lead host owns the run directory, logs and
        # checkpoints (non-lead writes would collide on shared storage or
        # produce N duplicate run dirs)
        self.is_lead = jax.process_index() == 0
        if run_dir is not None:
            self.run_dir = run_dir
        elif self.is_lead:
            self.run_dir = make_run_dir(cfg.save_log_dir, cfg.model_name,
                                        cfg.dataset_name, cfg.to_json())
        else:   # path used in messages only; never created/written
            self.run_dir = os.path.join(
                cfg.save_log_dir, f"nonlead_rank{jax.process_index()}")
        self.logger = RunLogger(self.run_dir) if self.is_lead \
            else NullLogger()
        self.stats = StepStats()
        self.start_epoch = 0
        self.best_mpjpe = float(np.inf)
        self.rng = jax.random.PRNGKey(cfg.seed + 17)
        self.preempt: Optional[PreemptionGuard] = None

        if cfg.resume_weight_path:
            self.state, self.start_epoch, self.best_mpjpe, finetune = \
                filtered_resume(self.state, cfg.resume_weight_path)
            if not finetune:
                # the checkpoint's schedule count reflects the WRITING
                # run's steps_per_epoch; re-pin it to ours so the cosine
                # LR resumes at epoch start_epoch, not wherever
                # count//steps_per_epoch happens to land
                self.state = reconcile_schedule_count(
                    self.state, self.start_epoch, self.steps_per_epoch)
            mode = "finetune" if finetune else "resume"
            self.logger.text(f"loaded {cfg.resume_weight_path} as {mode}; "
                             f"start_epoch={self.start_epoch}")

    # ------------------------------------------------------------------
    def enable_preemption_save(self, guard: Optional[PreemptionGuard] = None
                               ) -> PreemptionGuard:
        """Arm preemption-safe training (see train/preemption.py).

        On SIGTERM (or ``guard``'s signals) the epoch loop stops at the
        next step boundary, ``run()`` writes a resumable ``checkpoint``
        pinned to the *interrupted* epoch, and returns.  Resuming from it
        restarts that epoch.
        """
        self.preempt = (guard or PreemptionGuard()).install()
        return self.preempt

    def _sample_batch(self, seed=0) -> dict:
        if self.train_ds is None:
            return fake_sample_batch(min(self.cfg.batch_size, 8),
                                     self.cfg.crop_size,
                                     self.cfg.input_channels, seed)
        # init needs shapes, not the production batch size: eagerly
        # preprocessing a huge batch here would OOM exactly the
        # large-batch (grad_accum) configurations the step itself handles
        raw = self.train_ds.raw_batch(
            list(range(min(self.cfg.batch_size, len(self.train_ds), 8))))
        from ..data.preprocess import (InterHandRawBatch, preprocess_batch,
                                       preprocess_interhand_batch)
        fn = (preprocess_interhand_batch
              if isinstance(raw, InterHandRawBatch) else preprocess_batch)
        return fn(jax.device_put(raw), crop_size=self.cfg.crop_size,
                  sigma=self.cfg.sigma,
                  switch_joint_order=self.cfg.joint_order_switched)

    def _epoch_batches(self, split: str, seed: int) -> Iterator[dict]:
        cfg = self.cfg
        if self.train_ds is None:
            # each host draws DISTINCT synthetic samples (rank folded into
            # the seed): under multi-host the global batch is the
            # concatenation of per-host local batches, not N copies
            rank_off = jax.process_index() * 1_000_003
            for i in range(self.steps_per_epoch):
                yield fake_sample_batch(min(cfg.batch_size, 8), cfg.crop_size,
                                        cfg.input_channels,
                                        seed * 1000 + i + rank_off)
            return
        ds = self.train_ds if split == "training" else self.val_ds
        is_train = split == "training"
        shuffle = is_train and cfg.shuffle \
            and not cfg.use_val_dataset_to_debug
        if jax.process_count() > 1:
            # multi-host: every host loads only ITS shard of each global
            # batch; run_epoch's shard_batch assembles the shards into
            # global arrays (parallel.mesh.global_shard_batch)
            yield from self._multihost_epoch_batches(ds, shuffle, seed,
                                                     is_train=is_train)
            return
        # epoch permutation seed matches HostShardSampler's formula, so a
        # single-host run sees the SAME permutation a multi-host run
        # splits across hosts (and different cfg.seed runs differ)
        shuf_seed = cfg.seed * 100003 + seed
        # validation must see the WHOLE split (the reference val loader
        # has drop_last=False, trainval.py:141): the tail batch costs one
        # extra compile for its shape, and the exact mpjpe_sum/count
        # aggregation weighs it correctly.  Training drops the tail
        # (fixed step shape, one partial gradient step is noise).
        drop = is_train
        if self.fused:
            # raw device batches only; preprocessing happens inside the
            # fused step programs
            yield from raw_device_batches(
                ds, cfg.batch_size, shuffle=shuffle, seed=shuf_seed,
                drop_remainder=drop,
                depth=max(cfg.prefetch_depth, 2),
                workers=1 if getattr(ds, "_color_mm", None) is not None
                else 2,
                sharding=None)
            return
        aug_flags = dict(coord_uv_noise=cfg.coord_uv_noise,
                         crop_center_noise=cfg.crop_center_noise,
                         crop_scale_noise=cfg.crop_scale_noise,
                         crop_offset_noise=cfg.crop_offset_noise,
                         scoremap_dropout=cfg.scoremap_dropout,
                         hue_aug=cfg.hue_aug) if is_train else None
        aug_rng = jax.random.PRNGKey(cfg.seed * 7919 + seed) \
            if is_train else None
        # collate + H2D overlapped in a small thread pool (the raw batches
        # arrive on device; device_batches then only runs the jitted
        # preprocessing)
        raw_iter = raw_device_batches(
            ds, cfg.batch_size, shuffle=shuffle, seed=shuf_seed,
            drop_remainder=drop,
            depth=max(cfg.prefetch_depth, 2),
            workers=1 if getattr(ds, "_color_mm", None) is not None else 2)
        # prefetch_depth=0: raw_iter already overlaps collate in its own
        # pool, and its lazy device_put must run on THIS thread (see
        # raw_device_batches)
        yield from device_batches(
            raw_iter,
            crop_size=cfg.crop_size, sigma=cfg.sigma,
            switch_joint_order=cfg.joint_order_switched,
            prefetch_depth=0,
            aug_rng=aug_rng, aug_flags=aug_flags)

    def _multihost_epoch_batches(self, ds, shuffle: bool, epoch: int,
                                 sampler=None, is_train: bool = True):
        """Per-host local RAW batches for multi-host training (fused-only).

        Each host reads its deterministic contiguous shard of the
        epoch-seeded global permutation (``HostShardSampler``, the
        DistributedSampler analogue); run_epoch's ``shard_batch`` turns
        the local shard into global arrays, and augmentation/preprocessing
        happen INSIDE the one global fused step program (so per-sample
        noise is drawn over the whole global batch -- host-local aug rng
        would duplicate draws across hosts).  ``sampler`` is injectable
        for testing host ranks without multiple processes.

        Training truncates the remainder (fixed step shape; one partial
        gradient step is noise).  Validation must see the WHOLE split --
        same drop_remainder=False semantics as single-host -- so it uses
        the sampler's padded batches and zeroes the visibility of the
        wrap-around pad duplicates: they contribute 0 to both mpjpe_sum
        and mpjpe_count, making the multi-host epoch MPJPE EXACT (not
        tail-truncated, not pad-biased).
        """
        from ..data.pipeline import prefetch_map
        from ..parallel.distributed import HostShardSampler

        cfg = self.cfg
        if not self.fused:
            raise ValueError(
                "multi-host training requires the fused step path: keep "
                "fuse_preprocess=True (host-local preprocessing would "
                "correlate augmentation draws across hosts and bounce "
                "batches device->host->device)")
        if sampler is None:
            sampler = HostShardSampler(len(ds), cfg.batch_size,
                                       shuffle=shuffle, seed=cfg.seed)
        if is_train:
            chunks = list(sampler.local_batches(epoch))
            yield from prefetch_map(ds.raw_batch, chunks,
                                    depth=max(cfg.prefetch_depth, 2),
                                    workers=1)
            return

        def fetch(chunk_valid):
            chunk, valid = chunk_valid
            raw = ds.raw_batch(chunk)
            if not valid.all():
                vis = np.asarray(raw.keypoint_vis) * \
                    valid[:, None].astype(np.asarray(raw.keypoint_vis).dtype)
                raw = raw._replace(keypoint_vis=vis)
            return raw

        chunks = list(sampler.local_batches_padded(epoch))
        yield from prefetch_map(fetch, chunks,
                                depth=max(cfg.prefetch_depth, 2), workers=1)

    # ------------------------------------------------------------------
    def _finish_train_metrics(self, metrics, epoch, idx, losses_acc):
        """Per-step bookkeeping shared by the single- and multi-step
        paths: NaN abort, loss accumulation, periodic logging."""
        if self.cfg.nan_check:
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val):
                self.logger.text(
                    f"FATAL: non-finite loss {loss_val} at epoch "
                    f"{epoch} iter {idx}; aborting (resume from the "
                    f"last checkpoint in {self.run_dir})")
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch} "
                    f"iter {idx}")
        for k, v in metrics.items():
            if k not in ("mpjpe_sum", "mpjpe_count"):
                losses_acc[k] = losses_acc.get(k, 0.0) + float(v)
        every = self.cfg.log_every_steps
        if every and idx % every == 0:
            # per-iteration visibility (reference tqdm loss breakdown,
            # trainval.py:364) -- exposes input-boundness live
            terms = ", ".join(
                f"{k}: {float(v):.5f}" for k, v in metrics.items()
                if k not in ("mpjpe_sum", "mpjpe_count"))
            self.logger.text(
                f"  epoch {epoch:03d} iter {idx:05d}/"
                f"{self.steps_per_epoch:05d} | {terms} | "
                f"{self.stats.summary()}")

    def _run_group(self, group, epoch, losses_acc):
        """Dispatch a full steps_per_dispatch group as ONE program and
        book each scanned step's metrics (stacked on axis 0).

        Group batches arrive as HOST arrays: one ``np.stack`` + ONE
        sharded device_put per group (stacking already-sharded device
        batches would add an on-device stack computation plus a reshard
        per group, spending part of the dispatch-overhead saving
        ``steps_per_dispatch`` exists to recover)."""
        idx0, batches = group[0][0], [b for _, b in group]
        stacked = shard_batch_stacked(
            jax.tree.map(lambda *xs: np.stack(xs), *batches), self.mesh)
        self.rng, step_rng = jax.random.split(self.rng)
        self.stats.step.tic()
        self.state, metrics_k = self.multi_step(self.state, stacked,
                                                step_rng)
        self.stats.step.toc()
        host = jax.tree.map(np.asarray, metrics_k)
        for j in range(len(group)):
            self._finish_train_metrics(
                {k: v[j] for k, v in host.items()}, epoch, idx0 + j,
                losses_acc)
        return len(group)

    def run_epoch(self, epoch: int, split: str, fast_debug: bool = False):
        is_train = split == "training"
        losses_acc: dict = {}
        mpjpe_sum = 0.0
        mpjpe_count = 0.0
        n = 0
        group_k = self.cfg.steps_per_dispatch \
            if is_train and self.multi_step is not None else 1
        group: list = []
        self.stats.input.tic()
        for idx, batch in enumerate(self._epoch_batches(split, epoch)):
            self.stats.input.toc()
            if fast_debug and idx > 2:
                break
            if self._preempt_now():
                # buffered (not yet dispatched) group batches are dropped:
                # the preemption checkpoint pins the interrupted epoch and
                # resume restarts it, same as the single-step path
                self.logger.text(
                    f"preemption requested: stopping {split} at epoch "
                    f"{epoch} iter {idx}")
                group = []
                break
            if group_k > 1:
                # keep the HOST batch; _run_group stacks + shards once
                group.append((idx, batch))
                if len(group) == group_k:
                    n += self._run_group(group, epoch, losses_acc)
                    group = []
                self.stats.input.tic()
                continue
            batch = shard_batch(batch, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.stats.step.tic()
            if is_train:
                self.state, metrics = self.train_step(self.state, batch,
                                                      step_rng)
            else:
                metrics = self.eval_step(self.state, batch, step_rng)
                mpjpe_sum += float(metrics["mpjpe_sum"])
                mpjpe_count += float(metrics["mpjpe_count"])
            self.stats.step.toc()
            if is_train:
                self._finish_train_metrics(metrics, epoch, idx, losses_acc)
            else:
                for k, v in metrics.items():
                    if k in ("mpjpe_sum", "mpjpe_count"):
                        continue
                    losses_acc[k] = losses_acc.get(k, 0.0) + float(v)
            n += 1
            self.stats.input.tic()
        self.stats.input.toc()
        # epoch tail that didn't fill a group: run single-step fused
        for idx, batch in group:
            batch = shard_batch(batch, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.stats.step.tic()
            self.state, metrics = self.train_step(self.state, batch,
                                                  step_rng)
            self.stats.step.toc()
            self._finish_train_metrics(metrics, epoch, idx, losses_acc)
            n += 1

        means = {k: v / max(n, 1) for k, v in losses_acc.items()}
        # a validation pass that saw no visible keypoints (empty dataset or
        # preemption before the first batch) yields NO metric -- 0.0 here
        # would masquerade as a perfect MPJPE and poison best-checkpoint
        # selection
        epoch_mpjpe = (mpjpe_sum / mpjpe_count if mpjpe_count else None) \
            if not is_train else None
        tag = "Training" if is_train else "Validation"
        info = f"{tag} Epoch: {epoch:03d}, " + ", ".join(
            f"{k}: {v:.5f}" for k, v in means.items())
        if epoch_mpjpe is not None:
            info += f", MPJPE: {epoch_mpjpe:.5f}"
            self.logger.scalar(f"{tag} epoch MPJPE", epoch_mpjpe, epoch)
        else:
            self.logger.scalar(f"{tag} epoch loss", means.get("loss", 0.0),
                               epoch)
        info += f" | {self.stats.summary()}"
        self.logger.text(info)
        return epoch_mpjpe

    def run(self, fast_debug: bool = False,
            max_epoch: Optional[int] = None) -> float:
        """Full train/val loop; returns best val MPJPE."""
        end = max_epoch if max_epoch is not None else self.cfg.max_epoch
        for epoch in range(self.start_epoch, end):
            if epoch == self.cfg.profile_epoch and self.is_lead:
                # lead-only: a non-lead trace would create/write the
                # placeholder nonlead_rankN dir the is_lead gating exists
                # to avoid (steps are identical across hosts anyway)
                from ..utils.device_info import profile_trace
                with profile_trace(os.path.join(self.run_dir, "profile")):
                    self.run_epoch(epoch, "training", fast_debug)
            else:
                self.run_epoch(epoch, "training", fast_debug)
            if self._preempt_now():
                # save resumable state pinned to the INTERRUPTED epoch
                # (it ran partially; resume restarts it), then exit clean
                self._save_preemption_checkpoint(epoch)
                return self.best_mpjpe
            val = self.run_epoch(epoch, "validation", fast_debug)
            if self._preempt_now():
                # training for this epoch completed but validation was cut
                # short: the partial `val` is biased, so do NOT touch
                # best/checkpoint_best; resume continues at the next epoch
                self._save_preemption_checkpoint(epoch + 1)
                return self.best_mpjpe
            is_best = val is not None and val < self.best_mpjpe
            if is_best:
                self.best_mpjpe = val
            if self.is_lead:   # params are replicated; one host persists
                save_checkpoint(os.path.abspath(self.run_dir), self.state,
                                epoch + 1, self.best_mpjpe, is_best)
        return self.best_mpjpe

    def _preempt_now(self) -> bool:
        """Cross-host-consistent preemption flag.

        On multi-host runs a skewed SIGTERM must not let one host break
        out while its peers enter the next collective step program (that
        deadlocks the fleet at the exact moment it should checkpoint):
        hosts all-gather the local flag at every step boundary so every
        host stops at the SAME boundary.  Arm the guard on all hosts (the
        CLI does).
        """
        if self.preempt is None:
            return False
        if jax.process_count() == 1:
            return self.preempt.requested
        from jax.experimental import multihost_utils
        return bool(np.any(multihost_utils.process_allgather(
            np.asarray(self.preempt.requested))))

    def _save_preemption_checkpoint(self, start_epoch: int) -> None:
        if self.is_lead:
            save_checkpoint(os.path.abspath(self.run_dir), self.state,
                            start_epoch, self.best_mpjpe, is_best=False)
        self.logger.text(
            f"preemption checkpoint written (resumes at epoch "
            f"{start_epoch}); resume with --resume "
            f"{self.run_dir}/checkpoint")
