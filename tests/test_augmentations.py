"""Augmentation-path tests for the device preprocessing pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.data.preprocess import (RawBatch, preprocess_batch,
                                          scale_to_size, yiq_hue_rotate)


@pytest.fixture(scope="module")
def raw(fixtures):
    r = fixtures("rhd_raw")
    return RawBatch(image=jnp.asarray(r["image"]),
                    mask=jnp.asarray(r["mask"]),
                    keypoint_uv=jnp.asarray(r["keypoint_uv"]),
                    keypoint_vis=jnp.asarray(r["keypoint_vis"]),
                    keypoint_xyz=jnp.asarray(r["keypoint_xyz"]),
                    camera_K=jnp.asarray(r["camera_K"]))


def test_coord_uv_noise_changes_uv_only(raw):
    base = preprocess_batch(raw)
    noisy = preprocess_batch(raw, rng=jax.random.PRNGKey(0),
                             coord_uv_noise=True)
    assert not np.allclose(noisy["keypoint_uv21"], base["keypoint_uv21"])
    # xyz ground truth untouched
    np.testing.assert_array_equal(noisy["keypoint_xyz21"],
                                  base["keypoint_xyz21"])
    # noise is small (sigma 2.5 px), crop windows stay comparable
    d = np.abs(np.asarray(noisy["keypoint_uv21"]) -
               np.asarray(base["keypoint_uv21"]))
    assert d.mean() < 30


def test_crop_noise_changes_crop(raw):
    base = preprocess_batch(raw)
    jit1 = preprocess_batch(raw, rng=jax.random.PRNGKey(1),
                            crop_center_noise=True, crop_scale_noise=True,
                            crop_offset_noise=True)
    assert not np.allclose(jit1["image_crop"], base["image_crop"])
    # different key -> different crop
    jit2 = preprocess_batch(raw, rng=jax.random.PRNGKey(2),
                            crop_center_noise=True, crop_scale_noise=True,
                            crop_offset_noise=True)
    assert not np.allclose(jit1["image_crop"], jit2["image_crop"])


def test_scoremap_dropout_scaling(raw):
    out = preprocess_batch(raw, rng=jax.random.PRNGKey(3),
                           scoremap_dropout=True)
    sm = np.asarray(out["scoremap"])
    base = np.asarray(preprocess_batch(raw)["scoremap"])
    # kept elements are x4 (p/(1-p) with p=0.8); ~80% dropped
    nz = sm != 0
    frac = nz.mean() / max((base != 0).mean(), 1e-9)
    assert 0.1 < frac < 0.35
    sel = nz & (base > 1e-6)
    np.testing.assert_allclose(sm[sel] / base[sel], 4.0, rtol=1e-4)


def test_hue_rotate_preserves_luma():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 8, 8, 3)).astype(np.float32))
    out = yiq_hue_rotate(img, jnp.asarray([0.05, -0.05]))
    luma_w = np.array([0.299, 0.587, 0.114])
    li = np.asarray(img + 0.5) @ luma_w
    lo = np.asarray(out + 0.5) @ luma_w
    np.testing.assert_allclose(lo, li, atol=1e-2)
    # zero rotation is identity
    same = yiq_hue_rotate(img, jnp.zeros(2))
    np.testing.assert_allclose(same, img, atol=1e-5)


def test_scale_to_size_contract(raw):
    base = preprocess_batch(raw)
    s = scale_to_size(base, (240, 320))
    assert s["image"].shape[1:3] == (240, 320)
    assert set(s.keys()) == {"image", "keypoint_uv21", "keypoint_vis21"}


def test_heatmap_3d_matches_reference_formula():
    from handpose_tpu.ops.heatmap import render_gaussian_heatmap_3d

    rng = np.random.default_rng(0)
    jc = rng.uniform(0, 64, (2, 4, 3)).astype(np.float32)
    sigma = 2.5
    vol = np.asarray(render_gaussian_heatmap_3d(jnp.asarray(jc), (8, 8, 8),
                                                sigma))
    zz, yy, xx = np.meshgrid(np.arange(8), np.arange(8), np.arange(8),
                             indexing="ij")
    ref = np.exp(-(((xx[None, None] - jc[:, :, 0, None, None, None]) / sigma)
                   ** 2) / 2
                 - (((yy[None, None] - jc[:, :, 1, None, None, None]) / sigma)
                    ** 2) / 2
                 - (((zz[None, None] - jc[:, :, 2, None, None, None]) / sigma)
                    ** 2) / 2) * 255
    np.testing.assert_allclose(vol, ref, atol=1e-3)


def test_scale_to_size_branch(raw):
    """Flag on -> reduced dict {image, uv, vis} at scale_target_size
    (reference dataloaderRHD.py:464-488: replaces data_dict; uv scaled by
    target/full-image even though uv is crop-space -- reference quirk)."""
    base = preprocess_batch(raw)
    out = preprocess_batch(raw, scale_to_size=True,
                           scale_target_size=(240, 320))
    assert set(out) == {"image", "keypoint_uv21", "keypoint_vis21"}
    B, H, W, _ = raw.image.shape
    assert out["image"].shape == (B, 240, 320, 3)
    np.testing.assert_allclose(
        np.asarray(out["keypoint_uv21"]),
        np.asarray(base["keypoint_uv21"]) *
        np.asarray([320 / W, 240 / H], np.float32), rtol=1e-6)


def test_random_crop_to_size_branch(raw):
    """Flag on -> reduced dict {image, hand_parts, hand_mask} cropped to
    random_crop_size (intended behavior of the commented-out reference
    branch, dataloaderRHD.py:490-512)."""
    out = preprocess_batch(raw, rng=jax.random.PRNGKey(3),
                           random_crop_to_size=True, random_crop_size=200)
    assert set(out) == {"image", "hand_parts", "hand_mask"}
    B, H, W, _ = raw.image.shape
    assert out["image"].shape == (B, 200, 200, 3)
    assert out["hand_parts"].shape == (B, 200, 200)
    assert out["hand_mask"].shape == (B, 200, 200, 2)
    # different rng -> different crop window
    out2 = preprocess_batch(raw, rng=jax.random.PRNGKey(4),
                            random_crop_to_size=True, random_crop_size=200)
    assert not np.allclose(np.asarray(out["image"]),
                           np.asarray(out2["image"]))
    # hand_mask consistency: mask channels complement each other
    hm = np.asarray(out["hand_mask"])
    np.testing.assert_array_equal(hm.sum(-1), np.ones_like(hm[..., 0]))
    # crop CONTENT comes from the (mirrored) full image: locate sample
    # 0's crop as an exact window of the full-size output
    full = np.asarray(preprocess_batch(raw)["image"][0])
    c0 = np.asarray(out["image"][0])
    S = 200
    found = False
    for y in range(full.shape[0] - S + 1):
        for x in range(full.shape[1] - S + 1):
            if full[y, x, 0] == c0[0, 0, 0] and \
                    np.array_equal(full[y:y + S, x:x + S], c0):
                found = True
                break
        if found:
            break
    assert found, "crop is not a window of the full image"


def test_worker_rejects_terminal_transforms(tmp_path):
    from handpose_tpu.config import Config
    from handpose_tpu.train import Worker
    cfg = Config(model_name="OnlyThreeDimHandPose", input_channels=3,
                 use_fake_data=True, save_log_dir=str(tmp_path),
                 scale_to_size=True)
    with pytest.raises(ValueError, match="scale_to_size"):
        Worker(cfg)


def test_random_crop_to_size_rejects_oversize(raw):
    """A crop larger than the source image must fail with a clear error,
    not an opaque dynamic_slice shape failure."""
    import pytest
    with pytest.raises(ValueError, match="exceeds the image extent"):
        preprocess_batch(raw, rng=jax.random.PRNGKey(0),
                         random_crop_to_size=True, random_crop_size=10_000)
