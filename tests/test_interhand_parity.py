"""InterHand2.6M parity: device preprocess vs reference __getitem__."""

import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.data.preprocess import (InterHandRawBatch,
                                          preprocess_interhand_batch)


@pytest.fixture(scope="module")
def processed(fixtures):
    raw = fixtures("interhand_raw")
    batch = InterHandRawBatch(
        image=jnp.asarray(raw["image"]),
        keypoint_uv=jnp.asarray(raw["keypoint_uv"]),
        keypoint_vis=jnp.asarray(raw["keypoint_vis"]),
        keypoint_xyz=jnp.asarray(raw["keypoint_xyz"]),
        camera_K=jnp.asarray(raw["camera_K"]),
        hand_left=jnp.asarray(raw["hand_left"]).astype(bool),
        bbox=jnp.asarray(raw["bbox"]),
        orig_wh=jnp.full((raw["image"].shape[0], 2),
                         raw["image"].shape[2], jnp.int32),
    )
    return preprocess_interhand_batch(batch), fixtures("interhand_getitem")


def test_core_coords(processed):
    out, ref = processed
    np.testing.assert_array_equal(out["hand_side"], ref["hand_side"])
    np.testing.assert_allclose(out["keypoint_xyz21"], ref["keypoint_xyz21"],
                               atol=1e-6)
    np.testing.assert_allclose(out["keypoint_scale"], ref["keypoint_scale"],
                               rtol=1e-5)
    np.testing.assert_allclose(out["keypoint_xyz21_rel_normed"],
                               ref["keypoint_xyz21_rel_normed"], atol=1e-5)
    np.testing.assert_allclose(out["keypoint_xyz21_local"],
                               ref["keypoint_xyz21_local"], atol=1e-4)
    np.testing.assert_allclose(out["kp_coord_xyz21_rel_can"],
                               ref["kp_coord_xyz21_rel_can"], atol=1e-4)
    np.testing.assert_allclose(out["rot_mat"], ref["rot_mat"], atol=1e-4)


def test_uv_vis(processed):
    out, ref = processed
    np.testing.assert_array_equal(
        np.asarray(out["keypoint_vis21"], np.float32), ref["keypoint_vis21"])
    np.testing.assert_allclose(out["keypoint_uv21"], ref["keypoint_uv21"],
                               rtol=1e-4, atol=2e-3)


def test_crop_and_mask(processed):
    out, ref = processed
    np.testing.assert_allclose(
        np.transpose(np.asarray(out["image_crop"]), (0, 3, 1, 2)),
        ref["image_crop"], atol=1e-5)
    np.testing.assert_array_equal(out["right_hand_mask"],
                                  ref["right_hand_mask"])


def test_intrinsics_scoremap(processed):
    out, ref = processed
    np.testing.assert_allclose(out["camera_intrinsic_matrix"],
                               ref["camera_intrinsic_matrix"], rtol=1e-5,
                               atol=1e-3)
    np.testing.assert_allclose(out["scoremap"], ref["scoremap"], atol=1e-5)


def test_interhand_worker_smoke(tmp_path):
    """One fast-debug epoch of the trainer on a synthetic InterHand tree."""
    from handpose_tpu.config import Config
    from handpose_tpu.data.interhand import write_synthetic_interhand
    from handpose_tpu.train import Worker

    root = tmp_path / "ih"
    write_synthetic_interhand(str(root), "train", n=16, seed=1)
    write_synthetic_interhand(str(root), "val", n=16, seed=2)
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="InterHand2.6M", dataset_root_dir=str(root),
                 batch_size=8, input_img_shape=(64, 64),
                 resnet_out_feature_dim=128, max_epoch=1,
                 save_log_dir=str(tmp_path / "logs"))
    w = Worker(cfg)
    w.run_epoch(0, "training", fast_debug=True)
    val = w.run_epoch(0, "validation", fast_debug=True)
    assert val is not None and np.isfinite(val)


@pytest.fixture(scope="module")
def ih_raw(fixtures):
    raw = fixtures("interhand_raw")
    return InterHandRawBatch(
        image=jnp.asarray(raw["image"]),
        keypoint_uv=jnp.asarray(raw["keypoint_uv"]),
        keypoint_vis=jnp.asarray(raw["keypoint_vis"]),
        keypoint_xyz=jnp.asarray(raw["keypoint_xyz"]),
        camera_K=jnp.asarray(raw["camera_K"]),
        hand_left=jnp.asarray(raw["hand_left"]).astype(bool),
        bbox=jnp.asarray(raw["bbox"]),
        orig_wh=jnp.full((raw["image"].shape[0], 2),
                         raw["image"].shape[2], jnp.int32),
    )


def test_ih_coord_uv_noise_stats(ih_raw):
    """InterHand coord_uv_noise: N(0, 2.5^2) px on the uv coords
    (reference dataloaderInterHand2M6.py:176-177,317-318 -- the branch as
    written would crash on int32 += float; this is its documented
    intent).  With hand_crop off, the uv diff IS the selected-hand noise,
    so its std must match the declared sigma."""
    import jax

    base = preprocess_interhand_batch(ih_raw, hand_crop=False,
                                      calculate_scoremap=False)
    outs = [preprocess_interhand_batch(
        ih_raw, hand_crop=False, calculate_scoremap=False,
        rng=jax.random.PRNGKey(s), coord_uv_noise=True) for s in range(8)]
    diffs = np.concatenate([
        np.abs(np.asarray(o["keypoint_uv21"], np.float64) -
               np.asarray(base["keypoint_uv21"], np.float64)).ravel()
        for o in outs])
    assert (diffs > 0).mean() > 0.99       # every coordinate perturbed
    # |N(0, s^2)| has E=s*sqrt(2/pi), E[x^2]=s^2 -> recover sigma
    sigma_hat = np.sqrt(np.mean(diffs ** 2))
    assert 2.2 < sigma_hat < 2.8
    # ground-truth xyz untouched
    np.testing.assert_array_equal(outs[0]["keypoint_xyz21"],
                                  base["keypoint_xyz21"])


def test_ih_scoremap_dropout_scaling(ih_raw):
    """torch F.dropout(p=0.8)*0.8 semantics (reference :549-552): ~20%
    survive, survivors scaled x4."""
    import jax

    base = np.asarray(preprocess_interhand_batch(ih_raw)["scoremap"])
    out = np.asarray(preprocess_interhand_batch(
        ih_raw, rng=jax.random.PRNGKey(7),
        scoremap_dropout=True)["scoremap"])
    nz = out != 0
    frac = nz.mean() / max((base != 0).mean(), 1e-9)
    assert 0.1 < frac < 0.35
    sel = nz & (base > 1e-6)
    np.testing.assert_allclose(out[sel] / base[sel], 4.0, rtol=1e-4)


def test_interhand_worker_trains_with_aug(tmp_path):
    """The aug flags reach the fused InterHand train step (the Worker no
    longer hardcodes aug=None for InterHand)."""
    from handpose_tpu.config import Config
    from handpose_tpu.data.interhand import write_synthetic_interhand
    from handpose_tpu.train import Worker

    root = tmp_path / "ih"
    write_synthetic_interhand(str(root), "train", n=16, seed=3)
    write_synthetic_interhand(str(root), "val", n=16, seed=4)
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="InterHand2.6M", dataset_root_dir=str(root),
                 batch_size=8, input_img_shape=(64, 64),
                 resnet_out_feature_dim=128, max_epoch=1,
                 coord_uv_noise=True, scoremap_dropout=True,
                 save_log_dir=str(tmp_path / "logs"))
    w = Worker(cfg)
    w.run_epoch(0, "training", fast_debug=True)
    val = w.run_epoch(0, "validation", fast_debug=True)
    assert val is not None and np.isfinite(val)


def test_pad_to_keeps_crops_correct(tmp_path):
    """Padding the decoded images must not change crops or annotations."""
    from handpose_tpu.data.interhand import (InterHandDataset,
                                             write_synthetic_interhand)
    from handpose_tpu.data.preprocess import preprocess_interhand_batch

    root = tmp_path / "ih"
    write_synthetic_interhand(str(root), "val", n=4, seed=5)
    plain = InterHandDataset(str(root), "val")
    padded = InterHandDataset(str(root), "val", pad_to=(384, 400))
    a = preprocess_interhand_batch(plain.raw_batch([0, 1, 2, 3]))
    b = preprocess_interhand_batch(padded.raw_batch([0, 1, 2, 3]))
    np.testing.assert_allclose(np.asarray(a["image_crop"]),
                               np.asarray(b["image_crop"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a["keypoint_uv21"]),
                               np.asarray(b["keypoint_uv21"]), atol=1e-4)


def test_interhand_decoded_cache(tmp_path):
    from handpose_tpu.data.interhand import (InterHandDataset,
                                             write_synthetic_interhand)

    root = tmp_path / "ih"
    write_synthetic_interhand(str(root), "val", n=4, seed=9)
    plain = InterHandDataset(str(root), "val", pad_to=(320, 320))
    cached = InterHandDataset(str(root), "val", pad_to=(320, 320),
                              cache_decoded=True)
    a = plain.raw_batch([0, 1, 2])
    b = cached.raw_batch([0, 1, 2])
    np.testing.assert_array_equal(a.image, b.image)
    np.testing.assert_array_equal(a.bbox, b.bbox)


def test_variable_resolution_single_compile(tmp_path):
    """Mixed-resolution captures (like real InterHand2.6M) must flow
    through ONE compiled preprocessing program via pad_to='auto' --
    without it, every new resolution retraces the jitted pipeline."""
    from handpose_tpu.data.interhand import (InterHandDataset,
                                             write_synthetic_interhand)
    from handpose_tpu.data.preprocess import preprocess_interhand_batch

    root = tmp_path / "ih_varres"
    write_synthetic_interhand(
        str(root), "val", n=6, seed=7,
        image_sizes=[(320, 320), (256, 224), (288, 304)])
    ds = InterHandDataset(str(root), "val", pad_to="auto")
    assert ds.pad_to == (320, 320)

    shapes = set()
    samples = []
    for raw in ds.batches(2):
        shapes.add(raw.image.shape)
        samples.append(preprocess_interhand_batch(raw, crop_size=128))
    assert len(shapes) == 1, f"padding failed, saw shapes {shapes}"
    assert len(samples) == 3
    for s in samples:
        assert s["image_crop"].shape == (2, 128, 128, 3)
        assert np.isfinite(np.asarray(s["keypoint_xyz21"])).all()


def test_worker_wires_pad_and_cache(tmp_path):
    """Worker must construct InterHandDataset with pad_to='auto' and the
    config's cache_decoded so real variable-resolution runs hold one
    compiled program and stream from the memmap cache."""
    from handpose_tpu.config import Config
    from handpose_tpu.data.interhand import write_synthetic_interhand
    from handpose_tpu.train import Worker

    root = tmp_path / "ih_wire"
    sizes = [(320, 320), (256, 224)]
    write_synthetic_interhand(str(root), "train", n=4, seed=1,
                              image_sizes=sizes)
    write_synthetic_interhand(str(root), "val", n=4, seed=2,
                              image_sizes=sizes)
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 dataset_name="InterHand2.6M", dataset_root_dir=str(root),
                 batch_size=2, input_img_shape=(64, 64),
                 resnet_out_feature_dim=128, cache_decoded=True,
                 save_log_dir=str(tmp_path / "logs"))
    w = Worker(cfg)
    assert w.train_ds.pad_to == (320, 320)
    assert w.train_ds._color_mm is not None      # cache built
    assert w.val_ds.pad_to == (320, 320)
    shapes = {raw.image.shape for raw in w.train_ds.batches(2)}
    assert len(shapes) == 1


def test_rootnet_bbox_switch(tmp_path):
    """trans_test='rootnet' must take bboxes/abs_depth from the rootnet
    output json VERBATIM (reference dataloaderInterHand2M6.py:123-125),
    trans_test='gt' from process_bbox of the GT annotation (:126-129),
    and a missing rootnet file must raise, never silently degrade to a
    GT-bbox eval."""
    from handpose_tpu.data.interhand import (InterHandDataset,
                                             write_synthetic_interhand,
                                             write_synthetic_rootnet)

    root = tmp_path / "ih_rootnet"
    write_synthetic_interhand(str(root), "val", n=4, seed=3)

    # missing rootnet json -> loud failure
    with pytest.raises(FileNotFoundError, match="rootnet"):
        InterHandDataset(str(root), "val", trans_test="rootnet")

    import json
    import os.path as osp
    p = write_synthetic_rootnet(str(root), "val")
    with open(p) as f:
        rn = {a["annot_id"]: a for a in json.load(f)}

    rds = InterHandDataset(str(root), "val", trans_test="rootnet")
    gds = InterHandDataset(str(root), "val", trans_test="gt")
    assert len(rds) == len(gds) == 4
    for i, (r, g) in enumerate(zip(rds.datalist, gds.datalist)):
        np.testing.assert_allclose(r["bbox"], rn[i]["bbox"])
        np.testing.assert_allclose(r["abs_depth"], rn[i]["abs_depth"])
        # the two sources genuinely differ on this tree
        assert not np.allclose(r["bbox"], g["bbox"])
        # GT abs_depth = per-hand root depth in camera frame (:129)
        np.testing.assert_allclose(
            g["abs_depth"], [g["joint_cam"][20, 2], g["joint_cam"][41, 2]])

    # rootnet applies only to val/test; train always uses GT bboxes
    write_synthetic_interhand(str(root), "train", n=2, seed=4)
    tds = InterHandDataset(str(root), "train", trans_test="rootnet")
    assert len(tds) == 2
