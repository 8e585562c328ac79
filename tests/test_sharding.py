"""dp x tp sharding-rule tests (handpose_tpu.parallel.sharding).

The dryrun entry point (`__graft_entry__.dryrun_multichip`) now imports
these rules; here they are validated standalone on the 8-virtual-CPU
mesh: mesh factory shapes, the param layout rule, and tp=2 numerical
parity of a full train step against the replicated single-step result.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from handpose_tpu.config import Config
from handpose_tpu.data.preprocess import model_input
from handpose_tpu.data.synthetic import fake_sample_batch
from handpose_tpu.models import build_model
from handpose_tpu.parallel import shard_batch
from handpose_tpu.parallel.sharding import (make_dp_tp_mesh, param_sharding,
                                            shard_train_state)
from handpose_tpu.train.state import create_train_state
from handpose_tpu.train.steps import make_train_step

# float32 compute: in bfloat16 the partitioning-dependent reduction order
# compounds through 18 BatchNorm'd layers to %-level output drift, which
# would mask a genuine sharding bug
CFG = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
             batch_size=8, input_img_shape=(64, 64),
             resnet_out_feature_dim=128, use_fake_data=True, max_epoch=2,
             compute_dtype="float32")


def _state_and_batch(cfg, n=8, seed=0):
    model = build_model(cfg)
    batch = fake_sample_batch(n, cfg.input_img_shape[0], cfg.input_channels,
                              seed=seed)
    inp = model_input(batch, cfg.input_channels)
    pose_x0 = batch["keypoint_xyz21_rel_normed"].reshape(n, 1, -1)
    args = (inp, batch["camera_intrinsic_matrix"], batch["keypoint_scale"],
            batch["keypoint_xyz_root"], pose_x0)
    state = create_train_state(model, cfg, args, jax.random.PRNGKey(0), 10)
    return model, state, batch


def test_mesh_shapes():
    assert make_dp_tp_mesh(8).shape == {"data": 4, "model": 2}
    assert make_dp_tp_mesh(4).shape == {"data": 2, "model": 2}
    assert make_dp_tp_mesh(2).shape == {"data": 2, "model": 1}
    assert make_dp_tp_mesh(1).shape == {"data": 1, "model": 1}
    with pytest.raises(ValueError):
        make_dp_tp_mesh(1024)


def test_param_rule_layouts():
    mesh = make_dp_tp_mesh(8)
    wide = np.zeros((3, 3, 16, 128), np.float32)     # conv kernel
    assert param_sharding(mesh, wide).spec == P(None, None, None, "model")
    dense = np.zeros((256, 64), np.float32)
    assert param_sharding(mesh, dense).spec == P(None, "model")
    bias = np.zeros((128,), np.float32)              # 1-D -> replicated
    assert param_sharding(mesh, bias).spec == P()
    odd = np.zeros((16, 63), np.float32)             # not divisible by tp
    assert param_sharding(mesh, odd).spec == P()
    narrow = np.zeros((16, 32), np.float32)          # too narrow
    assert param_sharding(mesh, narrow).spec == P()


@pytest.mark.parametrize("pool_grad,grad_accum",
                         [("native", 1), ("argmax", 1), ("native", 2)])
def test_tp2_train_step_parity_vs_replicated(pool_grad, grad_accum):
    assert len(jax.devices()) == 8
    mesh = make_dp_tp_mesh(8)          # dp=4, tp=2
    # 'argmax' routes the pool backward through ops/pooling.py's custom
    # VJP -- its pad/argmax/where graph must shard like the native
    # select-and-scatter (same parity bound); grad_accum=2 reshapes the
    # dp-sharded batch to (k, B//k, ...) and scans -- the accumulated
    # update must match the replicated accumulated update
    cfg = CFG.replace(pool_grad=pool_grad, grad_accum=grad_accum)
    model, state, batch = _state_and_batch(cfg)
    # non-degenerate images: see test_train.py's sharded-step test -- the
    # constant fake image amplifies BN partition noise ~40x
    batch["image_crop"] = jax.random.uniform(
        jax.random.PRNGKey(42), batch["image_crop"].shape,
        minval=-0.5, maxval=0.5)
    step = make_train_step(model, cfg)

    sharded_state = shard_train_state(state, mesh)
    new_s, m = step(sharded_state, shard_batch(batch, mesh),
                    jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    # independent state (same seed): the step donates its input buffers,
    # and device_put to an identical sharding aliases rather than copies
    _, state_ref, _ = _state_and_batch(cfg)
    _, m_ref = step(state_ref, batch, jax.random.PRNGKey(1))
    # identical math modulo fp reduction order across shards
    # (f32-highest noise is ~1e-4; a loose 5e-2 would mask real psum/
    # denominator bugs -- see module docstring)
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-3)

    # param shardings survive the update (no silent re-replication)
    flat = jax.tree.leaves(new_s.params)
    wide = [a for a in flat if a.ndim >= 2 and a.shape[-1] >= 64
            and a.shape[-1] % 2 == 0]
    assert wide and any("model" in str(a.sharding.spec) for a in wide)


def test_opt_state_inherits_param_layout():
    mesh = make_dp_tp_mesh(8)
    _, state, _ = _state_and_batch(CFG)
    sharded = shard_train_state(state, mesh)
    specs = {str(a.sharding.spec) for a in jax.tree.leaves(sharded.opt_state)
             if hasattr(a, "sharding") and a.ndim >= 2
             and a.shape[-1] >= 64 and a.shape[-1] % 2 == 0}
    assert any("model" in s for s in specs)


def test_graft_dryrun_body_inline():
    """The driver's multichip check, run inline on the 8-device CPU mesh:
    fused preprocess+train step sharded dp x tp must compile and execute.
    Guards the exact code path MULTICHIP_r{N}.json is scored on."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(
        __file__).resolve().parent.parent))
    import __graft_entry__ as g

    g._dryrun_body(8)


def test_global_shard_batch_matches_shard_batch():
    """Single-process, global_shard_batch (the multi-host assembly path,
    jax.make_array_from_process_local_data) must produce exactly the
    layout and values of the plain sharded device_put."""
    from handpose_tpu.parallel.mesh import (global_shard_batch, make_mesh,
                                            shard_batch)

    mesh = make_mesh(shape=(8,))
    rng = np.random.default_rng(0)
    batch = {"image": rng.normal(size=(16, 8, 8, 3)).astype(np.float32),
             "vis": rng.uniform(size=(16, 21)) > 0.5,
             "scale": rng.normal(size=(16, 1)).astype(np.float32)}
    a = shard_batch(batch, mesh)
    b = global_shard_batch(batch, mesh)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_multihost_epoch_batches_partition(tmp_path):
    """Simulated 2-host epoch: each rank loads only its contiguous shard
    of the epoch permutation, shards are disjoint, and together they
    cover the (remainder-truncated) dataset -- without spawning
    processes (sampler rank injected)."""
    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
    from handpose_tpu.parallel.distributed import HostShardSampler
    from handpose_tpu.train import Worker

    write_synthetic_rhd(str(tmp_path), "evaluation", 16)
    ds = RHDDataset(str(tmp_path), "evaluation")

    cfg = CFG.replace(batch_size=4)
    w = object.__new__(Worker)          # duck-typed: no step compilation
    w.cfg = cfg
    w.fused = True

    seen = []
    for rank in (0, 1):
        sampler = HostShardSampler(len(ds), cfg.batch_size,
                                   process_index=rank, process_count=2,
                                   shuffle=True, seed=3)
        raws = list(Worker._multihost_epoch_batches(
            w, ds, True, epoch=1, sampler=sampler))
        # global batch 4 over 2 hosts -> local batch 2, 8 samples/host
        assert all(r.image.shape[0] == 2 for r in raws)
        assert len(raws) == 4
        seen.append(np.concatenate([r.keypoint_uv for r in raws]))
    # disjoint shards covering all 16 samples
    both = np.concatenate(seen)
    assert both.shape[0] == 16
    full = ds.raw_batch(list(range(16))).keypoint_uv
    key = lambda a: a.reshape(a.shape[0], -1).sum(1).round(3)
    assert sorted(key(both).tolist()) == sorted(key(full).tolist())


def test_multihost_val_covers_whole_split(tmp_path):
    """Validation across hosts must see the WHOLE split exactly once (the
    single-host drop_remainder=False semantics): the padded sampler wraps
    the tail up to a full global batch and the Worker zeroes the pad
    duplicates' visibility so they contribute 0 to mpjpe_sum/count."""
    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
    from handpose_tpu.parallel.distributed import HostShardSampler
    from handpose_tpu.train import Worker

    write_synthetic_rhd(str(tmp_path), "evaluation", 10)
    ds = RHDDataset(str(tmp_path), "evaluation")
    cfg = CFG.replace(batch_size=4)
    w = object.__new__(Worker)
    w.cfg = cfg
    w.fused = True

    # sampler math: n=10, global=4, 2 hosts -> 12 padded slots, every real
    # index exactly once, pads marked invalid
    all_valid_idx, n_pad = [], 0
    for rank in (0, 1):
        s = HostShardSampler(10, 4, process_index=rank, process_count=2,
                             shuffle=False, seed=0)
        for chunk, valid in s.local_batches_padded(0):
            assert len(chunk) == 2
            all_valid_idx += [i for i, v in zip(chunk, valid) if v]
            n_pad += int((~valid).sum())
    assert sorted(all_valid_idx) == list(range(10))
    assert n_pad == 2

    # Worker path: pad samples arrive with zero visibility
    raws = []
    for rank in (0, 1):
        s = HostShardSampler(10, 4, process_index=rank, process_count=2,
                             shuffle=False, seed=0)
        raws += list(Worker._multihost_epoch_batches(
            w, ds, False, epoch=0, sampler=s, is_train=False))
    assert len(raws) == 6                       # 3 global batches x 2 hosts
    vis = np.concatenate([np.asarray(r.keypoint_vis) for r in raws])
    assert vis.shape[0] == 12
    zero_rows = (~vis.astype(bool)).all(axis=1).sum()
    assert zero_rows >= 2                       # the two pad duplicates


def test_multihost_requires_fused_path(tmp_path):
    """Unfused multi-host would correlate host-local augmentation draws
    and bounce batches device->host->device; it is rejected clearly."""
    from handpose_tpu.data.rhd import RHDDataset, write_synthetic_rhd
    from handpose_tpu.train import Worker

    write_synthetic_rhd(str(tmp_path), "evaluation", 8)
    ds = RHDDataset(str(tmp_path), "evaluation")
    w = object.__new__(Worker)
    w.cfg = CFG.replace(batch_size=4)
    w.fused = False
    with pytest.raises(ValueError, match="fuse_preprocess"):
        list(Worker._multihost_epoch_batches(w, ds, False, epoch=0))
