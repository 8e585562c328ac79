"""Immutable experiment configuration.

TPU-native replacement for the reference's mutable module-global config
(reference: config/config.py:1-130).  Differences by design:

* frozen dataclass -- no runtime mutation; cross-layer signals that the
  reference passed by mutating globals (``is_inference``,
  ``joint_order_switched``, ``model_name`` derived from checkpoint paths;
  see reference trainval.py:41, inference.py:38, dataloaderRHD.py:528) are
  explicit fields / function arguments here.
* serialisable to JSON into the run directory for provenance (the reference
  copied config.py into the run dir, trainval.py:231).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any, Tuple

MODEL_NAMES = (
    "TwoDimHandPose",
    "TwoDimHandPoseWithFK",
    "ThreeDimHandPose",
    "OnlyThreeDimHandPose",
    "DiffusionHandPose",
    "MANO3DHandPose",
    "ThreeHandShapeAndPoseMANO",
    "Resnet50MANO3DHandPose",
    "Hand3DPoseNet",
    "Hand3DPosePriorNetwork",
)

# Loss-term gating per model (reference trainval.py:76-112).  Keys:
# xyz, uv, diffusion, hand_mask, regularization, contrastive.
LOSS_GATES = {
    "TwoDimHandPose": dict(uv=True),
    "TwoDimHandPoseWithFK": dict(xyz=True, uv=True),
    "DiffusionHandPose": dict(xyz=True, diffusion=True),
    "ThreeDimHandPose": dict(xyz=True),
    "OnlyThreeDimHandPose": dict(xyz=True),
    "MANO3DHandPose": dict(xyz=True),
    "ThreeHandShapeAndPoseMANO": dict(xyz=True),
    "Resnet50MANO3DHandPose": dict(xyz=True, hand_mask=True, regularization=True),
    # Trainer-B models (reference trainval_hand3DPose.py:284-288): masked xyz
    # L2 on the relative-normalised coords + rotation-matrix MSE.
    "Hand3DPoseNet": dict(xyz=True, rot=True),
    "Hand3DPosePriorNetwork": dict(xyz=True, rot=True),
}


@dataclass(frozen=True)
class Config:
    # -- dataset (reference config.py:3-9) --
    dataset_root_dir: str = "/data/RHD"
    dataset_name: str = "RHD"  # 'RHD' | 'InterHand2.6M' | 'synthetic'

    # -- dataloader (reference config.py:11-27) --
    shuffle: bool = True
    num_workers: int = 8           # host-side decode threads
    use_wrist_coord: bool = True
    sigma: float = 25.0
    hand_crop: bool = True
    # terminal dataset-output transforms (reference dataloaderRHD.py:43-45,
    # 464-512).  Both REPLACE the sample dict with a reduced one (so does
    # the reference), hence they are dataset/pipeline capabilities and the
    # Worker rejects them -- the reference trainer would KeyError likewise.
    random_crop_to_size: bool = False
    random_crop_size: int = 256
    scale_to_size: bool = False
    scale_target_size: Tuple[int, int] = (240, 320)
    hue_aug: bool = False
    coord_uv_noise: bool = False
    crop_center_noise: bool = False
    crop_scale_noise: bool = False
    crop_offset_noise: bool = False
    scoremap_dropout: bool = False
    calculate_scoremap: bool = True
    use_val_dataset_to_debug: bool = False

    # -- network (reference config.py:31-52) --
    model_name: str = "Hand3DPosePriorNetwork"
    input_channels: int = 24       # 3 | 21 | 24
    keypoint_num: int = 21
    resnet_out_feature_dim: int = 1024
    # BatchNorm batch-variance mode (see nn/norm.py):
    #   'fast'    flax's one-pass E[x^2]-E[x]^2 (flax's own default) --
    #             the default: +11.1% train step on v5e (MFU .4027 ->
    #             .4465, tools/bench_bn_modes.py r4).  Twin-training
    #             convergence vs the executed torch reference measured
    #             INSIDE the 3-seed shadow chaos band under 'fast'
    #             (flagship: 0.35% max-epoch-val divergence vs 0.39%
    #             band, NOTES_r4.md), so the speed is free at these
    #             activation scales.  Caveat: catastrophic cancellation
    #             when |mean| >> std (tests/test_norm.py pins the
    #             regime), and train-mode outputs drift slightly with
    #             the device partitioning.
    #   'stable'  two-pass, torch semantics, partition-invariant (sharded
    #             == single-chip to ~1e-6) -- use when bitwise
    #             partition-invariance or extreme activation scales
    #             matter more than 11% throughput.
    #   'shifted' one-pass variance centred on the RUNNING mean: benign
    #             cancellation once the running mean warms up; measured
    #             +2.7% train step on v5e (recovers only part of fast's
    #             win; kept as the middle point)
    # Eval/inference is unaffected by the choice.
    bn_variance: str = "fast"
    # legacy alias (round-2 snapshots): True upgrades 'stable' to 'fast'
    bn_fast_variance: bool = False
    # backbone stem variant: 'k3s2' (reference conv1 swap) or 'k3s2_s2d'
    # (same function via space-to-depth, 4x wider MXU contraction --
    # exact-equivalence tested; a perf knob, not a semantic one)
    resnet_stem: str = "k3s2"
    # stem max-pool gradient: 'argmax' routes the backward through a
    # recomputed in-window argmax (fused elementwise pass; same first-max
    # tie routing as torch/XLA, values equal to reassociation ulps) --
    # replaces the two serial select-and-scatter HLOs that profiled at
    # 5.2% of the fused train step (see ops/pooling.py). 'native' keeps
    # flax nn.max_pool's gradient. Forward/eval identical either way;
    # 'argmax' is reverse-mode only (custom_vjp blocks jvp/jacfwd).
    # Measured on v5e (tools/bench_pool_grad.py): 'argmax' is 0.54x
    # native (the recomputed argmax re-reads the stem activations and the
    # placements don't fuse), so it stays only as a tested alternative /
    # torch-tie-routing oracle. 'pallas' keeps the same first-max
    # routing but computes the whole backward in ONE VMEM-resident pass
    # (ops/pallas_kernels.py::max_pool_3x3s2p1_bwd_pallas) -- one HBM
    # read of x/dy and one write of dx, the traffic floor. Also measured
    # 0.43x in context (v5e round 5: 1425 vs 3282 img/s) despite ~par
    # isolation speed: the pallas_call fusion barrier costs more than
    # the serial select-and-scatter it removes. Keep 'native'.
    pool_grad: str = "native"
    # accepted-unused (schema parity): the reference declares it and then
    # force-disables it per model (reference trainval.py:103); uv-loss
    # gating lives in LOSS_GATES here.
    compute_uv_loss: bool = False

    # -- diffusion (reference config.py:55-61) --
    condition_feat_dim: int = 256
    num_timesteps: int = 400
    num_sampling_timesteps: int = 200
    # accepted-unused (schema parity): the reference declares
    # keypoint_feat_Ch but hardcodes channels=1 in the diffusion wrapper
    # (reference diffusionJointEstimation.py:21) and never reads the flag.
    keypoint_feat_ch: int = 1
    bone_length_num: int = 20
    other_joint_angles_num: int = 23
    # TPU addition: whether DiffusionHandPose runs the (expensive) DDIM
    # sampling loop on every *training* forward like the reference does
    # (reference DiffusionHandPose.py:43 + conditionalDiffusion.py:674-709).
    # Capability parity is kept (sampling is always available); making it
    # optional per-step is the performance fix SURVEY.md 3.3 calls for.
    diffusion_sample_in_train: bool = True
    # TPU addition: DDIM/DDPM sampler lax.scan unroll factor.  The denoise
    # step is ~600 tiny HLOs on (B, 63, C) tensors, so per-step dispatch is
    # a real cost; unrolling lets XLA schedule k steps together (~10% p50
    # win at 4 on v5e, tools/bench_ddim_unroll.py).  Numerically identical
    # up to fusion reassociation (tests/test_diffusion.py::
    # test_ddim_scan_unroll_equivalent); torch transfer parity re-pinned at
    # this default (tests/test_model_transfer_parity.py).
    sampler_unroll: int = 4
    # TPU addition: hoist time/cond embeddings + per-block time projections
    # out of the sampling scan into per-step tables ('auto': on when the
    # tables stay small, B <= 32).  Identical math, batched over steps;
    # equivalence pinned in tests/test_diffusion.py.
    sampler_hoist: str = "auto"     # 'auto' | 'on' | 'off'

    # -- MANO (reference config.py:64-68) --
    mano_right_hand_path: str = ""  # resolved by handpose_tpu.nn.mano.find_mano_pkl
    mano_pose_num: int = 10         # 6 | 10 | 45
    mano_beta_num: int = 10
    joint_order_switched: bool = True

    # -- ThreeHandShapeAndPose (reference config.py:70-71) --
    network_regress_uv: bool = False

    # -- training (reference config.py:75-101) --
    save_log_dir: str = "logs"
    max_epoch: int = 60
    finetune: bool = False
    batch_size: int = 200
    uv_from_xd: float = 3.0        # 2 | 2.5 | 3 (reference config.py:81)
    resume_weight_path: str | None = None
    use_fake_data: bool = False
    fast_trainval: bool = True
    lr: float = 1e-4
    lr_min: float = 1e-5
    seed: int = 0

    # -- input/output geometry (reference config.py:106-112) --
    image_size: Tuple[int, int] = (320, 320)   # RHD raw size
    input_img_shape: Tuple[int, int] = (256, 256)
    # accepted-unused by the harnesses (schema parity): consumed only by the
    # InterHand heatmap-space helpers, which take them as explicit arguments
    # here (ops/patch.py::transform_input_to_output_space,
    # ops/heatmap.py 3-D variant) rather than reading global config
    # (reference utils/preprocessing.py:141-149, compute_heatmap.py:13-15).
    output_hm_shape: Tuple[int, int, int] = (64, 64, 64)
    bbox_3d_size: float = 400.0
    bbox_3d_size_root: float = 400.0
    output_root_hm_shape: int = 64

    # -- InterHand schedule (reference config.py:119-130) --
    end_epoch: int = 20
    train_batch_size: int = 200
    val_batch_size: int = 200
    test_batch_size: int = 20
    # 'gt' | 'rootnet'.  Deliberate default divergence: the reference
    # defaults to 'rootnet' (config.py:129) but crashes on a missing
    # rootnet_output json (dataloaderInterHand2M6.py:79, bare open); we
    # default to 'gt' (the behaviour every tree without the external
    # rootnet artifact gets) and RAISE when 'rootnet' is requested but
    # the json is absent -- never a silent GT fallback.
    trans_test: str = "gt"
    # which InterHand split the Evaluator consumes ('val' | 'test'; the
    # reference evaluates val during training and test via its harness)
    interhand_eval_split: str = "val"

    # -- inference (reference config.py:88-101) --
    infer_batch_size: int = 100
    infer_resume_weight_path: str | None = None

    # -- TPU-specific --
    # per-iteration progress (the reference's tqdm loss-breakdown role,
    # reference trainval.py:364): every N training steps, log the loss
    # terms + step/input-stall timers to log.txt + console.  0 disables.
    log_every_steps: int = 20
    # run the device preprocessing INSIDE the jitted train/eval step (one
    # XLA program per step; ~2x faster than separate programs on v5e --
    # the scoremap dict never makes an HBM round trip between programs)
    fuse_preprocess: bool = True
    # rematerialise the forward in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for not keeping activations in HBM --
    # enables much larger per-chip batches
    remat: bool = False
    # gradient accumulation: split each train batch into this many
    # sequential microbatches inside the step (lax.scan), average the
    # grads, apply ONE Adam update.  A pure memory knob: activations AND
    # the fused-preprocess scoremaps materialise per-microbatch
    # (measured on v5e flagship: b1024 temp HBM 10.7 GiB single-shot vs
    # 3.0 GiB at grad_accum=4 with equal img/s; b4096 at grad_accum=16
    # trains at 3.35 GiB, 3073 img/s).  Same semantics as torch-style
    # accumulation: BN normalises per microbatch and running stats take
    # momentum once per microbatch.  batch_size % grad_accum == 0.
    grad_accum: int = 1
    # train steps per host dispatch: >1 scans the fused train step over
    # a stack of k raw batches in ONE XLA program (train/steps.py::
    # make_fused_multi_step), hiding the per-step dispatch round trip
    # (measured ~6% of the v5e step through the axon tunnel).  Identical
    # per-step math (per-step losses still logged/NaN-checked); only
    # preemption-check and logging LATENCY coarsens to k steps.
    # Requires fuse_preprocess (set 1 when disabling that); epoch tails
    # that don't fill a group run the single-step program.  Default 8
    # from the r5 v5e sweep (b256 flagship, scoped-VMEM default on):
    # k=1 3410 img/s (mfu .4611), k=4 3547 (.4796), k=8 3564 (.4819);
    # without the vmem lever: k=2 +4.7%, k=4 +5.7%, k=8 +6.2% over k=1.
    steps_per_dispatch: int = 8
    # scoped-VMEM budget (KiB) handed to the TPU compiler for the TRAIN
    # step programs (jax.jit compiler_options, TPU backend only; 0 =
    # compiler default 16 MiB).  Bigger fusion scratch lets XLA form
    # larger loop fusions for the BN/relu backward passes at the stem
    # resolutions -- measured +4.9% train step on v5e at 65536 (r5 sweep,
    # tools/bench_xla_options.py: 3443.9 vs 3282.9 img/s; 98304 failed
    # to compile, 32768 gave +3.5%).  Forward/eval programs keep the
    # compiler default (win not measured there).
    scoped_vmem_limit_kib: int = 65536
    # decode every image once into a uint8 memmap next to the dataset;
    # later epochs stream at memory bandwidth (RHD + InterHand)
    cache_decoded: bool = False
    # persistent XLA compilation cache (jax_compilation_cache_dir): warm
    # restarts of the same program skip the 20-40 s first-compile cost --
    # the production serving/preemption-resume fix for cold-start latency.
    # Empty = disabled.  Applied by Worker/Evaluator via
    # utils.device_info.enable_compilation_cache.
    compilation_cache_dir: str = ""
    nan_check: bool = True     # abort on non-finite training loss
    debug_nans: bool = False   # jax_debug_nans (traps the op that made one)
    profile_epoch: int = -1    # capture a jax.profiler trace of this epoch
    compute_dtype: str = "bfloat16"   # matmul/conv compute dtype
    param_dtype: str = "float32"
    mesh_shape: Tuple[int, ...] = (-1,)       # data-parallel axis; -1 = all devices
    mesh_axis_names: Tuple[str, ...] = ("data",)
    prefetch_depth: int = 2

    # ------------------------------------------------------------------
    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def crop_size(self) -> int:
        return self.input_img_shape[0]

    @property
    def bn_mode(self) -> str:
        """Resolved BatchNorm variance mode ('stable'|'fast'|'shifted'):
        the legacy bn_fast_variance=True flag upgrades the default."""
        if self.bn_variance == "stable" and self.bn_fast_variance:
            return "fast"
        return self.bn_variance

    @property
    def loss_gates(self) -> dict:
        gates = dict(xyz=False, uv=False, diffusion=False, hand_mask=False,
                     regularization=False, contrastive=False, rot=False)
        gates.update(LOSS_GATES[self.model_name])
        return gates

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        """Rehydrate a Config from ``to_json`` output (the run dir's
        ``config.json`` provenance snapshot, utils/logging.py).  Unknown
        keys are ignored so old snapshots keep loading after new fields
        are added; JSON lists become the tuples the fields declare."""
        raw = json.loads(s)
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in raw.items():
            if k not in fields:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)


def apply_overrides(cfg: Config, pairs) -> Config:
    """Apply generic ``--set key=value`` overrides with field-typed
    coercion (shared by trainval.py and inference.py).

    Tuples coerce per element from the CURRENT tuple's element type, so
    int tuples (``--set mesh_shape=4,2``) and str tuples
    (``--set mesh_axis_names=data,model``) both work; ``-1`` entries in
    an empty-safe way.  A fresh-typed scalar follows the field's current
    python type.
    """
    kw: dict = {}
    names = {f.name for f in dataclasses.fields(Config)}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        if key not in names:
            raise SystemExit(f"--set: unknown config field {key!r}")
        cur = getattr(cfg, key)
        if isinstance(cur, bool):
            kw[key] = val.lower() in ("1", "true", "yes", "on")
        elif isinstance(cur, int):
            kw[key] = int(val)
        elif isinstance(cur, float):
            kw[key] = float(val)
        elif isinstance(cur, tuple):
            elem = type(cur[0]) if cur else str
            kw[key] = tuple(elem(x) for x in val.split(","))
        else:
            kw[key] = val
    return cfg.replace(**kw)


DEFAULT_CONFIG = Config()
