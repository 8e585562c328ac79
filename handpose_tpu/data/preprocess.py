"""Device-side RHD preprocessing: the whole `__getitem__` pipeline, jitted.

TPU-native redesign of reference dataloader/RHD/dataloaderRHD.py:77-533.
The reference runs ~0.02 s/sample of python/torch per CPU worker (author
comment dataloaderRHD.py:532, ~6-10 s per bs=200 batch fetch,
trainval.py:270).  Here the host only decodes PNGs; everything from the
mask analysis down -- dominant-hand selection, mirroring, root-relative /
bone-relative / canonical transforms, visibility-driven crop + resize,
intrinsics rewrite, Gaussian scoremap rendering -- is one fused, batched,
fixed-shape XLA program (`preprocess_batch`) that runs on the accelerator.

The per-sample python branches of the reference become `jnp.where` masks;
the left/right selection, crop-window int truncation and scoremap gating
match the reference bit-for-bit (see tests/test_preprocess_parity.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.bone_rel import bone_rel_trafo
from ..ops.canonical import canonical_trafo
from ..ops.crop import (compute_crop_params, crop_intrinsics,
                        crop_resize_bilinear, crop_resize_nearest, crop_uv)
from ..ops.heatmap import render_gaussian_maps


class RawBatch(NamedTuple):
    """Host-produced raw inputs (uint8 images, float annotations)."""

    image: jnp.ndarray       # (B, H, W, 3) uint8 RGB
    mask: jnp.ndarray        # (B, H, W) uint8 hand-parts segmentation
    keypoint_uv: jnp.ndarray   # (B, 42, 2) float32
    keypoint_vis: jnp.ndarray  # (B, 42) bool/float
    keypoint_xyz: jnp.ndarray  # (B, 42, 3) float32
    camera_K: jnp.ndarray      # (B, 3, 3) float32


# MANO<->RHD joint-order switch (reference dataloaderRHD.py:587-591)
_SWITCH_PERM = [0] + [i + d for i in (1, 5, 9, 13, 17) for d in (3, 2, 1, 0)]


@partial(jax.jit, static_argnames=("crop_size", "sigma", "use_wrist_coord",
                                   "switch_joint_order", "calculate_scoremap",
                                   "hand_crop", "coord_uv_noise",
                                   "crop_center_noise", "crop_scale_noise",
                                   "crop_offset_noise", "scoremap_dropout",
                                   "hue_aug", "full_contract",
                                   "scale_to_size", "scale_target_size",
                                   "random_crop_to_size", "random_crop_size",
                                   "pallas_scoremap"))
def preprocess_batch(raw: RawBatch, crop_size: int = 256, sigma: float = 25.0,
                     use_wrist_coord: bool = True,
                     switch_joint_order: bool = True,
                     calculate_scoremap: bool = True,
                     hand_crop: bool = True,
                     rng: jnp.ndarray | None = None,
                     coord_uv_noise: bool = False,
                     crop_center_noise: bool = False,
                     crop_scale_noise: bool = False,
                     crop_offset_noise: bool = False,
                     scoremap_dropout: bool = False,
                     hue_aug: bool = False,
                     full_contract: bool = False,
                     scale_to_size: bool = False,
                     scale_target_size: tuple = (240, 320),
                     random_crop_to_size: bool = False,
                     random_crop_size: int = 256,
                     pallas_scoremap: str = "off") -> dict:
    """(B, ...) raw inputs -> the reference sample-dict contract, batched.

    Returns a dict with the keys consumed at reference trainval.py:276-291
    plus the canonical/local extras.

    Augmentations mirror the reference's config flags (all default off,
    reference config.py:20-26): uv coordinate noise (sigma 2.5 px), crop
    center/scale/offset jitter, scoremap dropout (p=0.8, rescaled like
    torch F.dropout then *p), and hue augmentation (which the reference
    declares but never implemented -- here a YIQ-space hue rotation of up
    to +-0.1 turns).  Pass ``rng`` when any flag is on.

    ``full_contract`` additionally emits the debug-ish mask keys of the
    reference dict (hand_parts, hand_map_l/r, hand_mask) that the trainers
    never consume -- off by default to keep the hot path lean.
    """
    aug_on = (coord_uv_noise or crop_center_noise or crop_scale_noise or
              crop_offset_noise or scoremap_dropout or hue_aug or
              random_crop_to_size)
    if aug_on:
        assert rng is not None, "augmentations need an rng key"
        rngs = list(jax.random.split(rng, 7))
    B, H, W, _ = raw.image.shape
    image = raw.image.astype(jnp.float32) / 255.0 - 0.5
    kp_uv = raw.keypoint_uv.astype(jnp.float32)
    kp_vis = raw.keypoint_vis.reshape(B, -1).astype(bool)
    kp_xyz = raw.keypoint_xyz.astype(jnp.float32)
    K = raw.camera_K.astype(jnp.float32)

    if not use_wrist_coord:
        palm_l = 0.5 * (kp_xyz[:, 0] + kp_xyz[:, 12])
        palm_r = 0.5 * (kp_xyz[:, 21] + kp_xyz[:, 33])
        kp_xyz = kp_xyz.at[:, 0].set(palm_l).at[:, 21].set(palm_r)
        palm_uv_l = 0.5 * (kp_uv[:, 0] + kp_uv[:, 12])
        palm_uv_r = 0.5 * (kp_uv[:, 21] + kp_uv[:, 33])
        kp_uv = kp_uv.at[:, 0].set(palm_uv_l).at[:, 21].set(palm_uv_r)
        kp_vis = kp_vis.at[:, 0].set(kp_vis[:, 0] | kp_vis[:, 12])
        kp_vis = kp_vis.at[:, 21].set(kp_vis[:, 21] | kp_vis[:, 33])

    if coord_uv_noise:
        # reference dataloaderRHD.py:102-104 (sigma 2.5 px on all 42 kps)
        kp_uv = kp_uv + 2.5 * jax.random.normal(rngs[0], kp_uv.shape)
    if hue_aug:
        image = yiq_hue_rotate(image, jax.random.uniform(
            rngs[1], (B,), minval=-0.1, maxval=0.1))

    # dominant-hand selection from the segmentation mask
    # (reference dataloaderRHD.py:171-201)
    m = raw.mask.astype(jnp.int32)
    hand_map_l = ((m > 1) & (m < 18)).astype(jnp.int32)
    hand_map_r = (m > 17).astype(jnp.int32)
    n_l = jnp.sum(hand_map_l, axis=(1, 2))
    n_r = jnp.sum(hand_map_r, axis=(1, 2))
    cond_left = n_l > n_r                                   # (B,)
    hand_side = jnp.where(cond_left, 0, 1)

    right_hand_mask = jnp.where(cond_left[:, None, None],
                                jnp.flip(hand_map_l, axis=2), hand_map_r)

    cl3 = cond_left[:, None, None]
    kp_xyz21 = jnp.where(cl3, kp_xyz[:, :21], kp_xyz[:, 21:])
    # mirror left hands into right-hand convention: negate x
    kp_xyz21 = jnp.where(cl3, kp_xyz21 * jnp.asarray([-1.0, 1.0, 1.0]),
                         kp_xyz21)
    kp_vis21 = jnp.where(cond_left[:, None], kp_vis[:, :21], kp_vis[:, 21:])
    kp_uv21 = jnp.where(cl3, kp_uv[:, :21], kp_uv[:, 21:])

    # root-relative + scale-normalised coords (dataloaderRHD.py:229-238)
    root = kp_xyz21[:, 0, :]
    rel = kp_xyz21 - root[:, None, :]
    if use_wrist_coord:
        scale = jnp.sqrt(jnp.sum(rel[:, 12, :] ** 2, axis=-1))
    else:
        scale = jnp.sqrt(jnp.sum((rel[:, 12, :] - rel[:, 11, :]) ** 2,
                                 axis=-1))
    rel_normed = rel / scale[:, None, None]

    local = bone_rel_trafo(rel_normed)
    can, rot = canonical_trafo(rel_normed)
    # rotation matrices are orthonormal: inverse == transpose
    # (reference uses torch.inverse, dataloaderRHD.py:252).  NB: the
    # accumulated total_rot_mat composes the per-step rotations in the
    # reversed order (reference canonical_trafo.py:142-156), so rot is a
    # training label consistent with the reference, not the exact
    # trans->can map -- replicated for parity.
    rot_inv = jnp.swapaxes(rot, -1, -2)

    # mirror the image + u coordinate for left hands
    # (dataloaderRHD.py:276-289)
    image = jnp.where(cond_left[:, None, None, None],
                      jnp.flip(image, axis=2), image)
    u_mirr = jnp.where(cond_left[:, None], W - kp_uv21[:, :, 0],
                       kp_uv21[:, :, 0])
    kp_uv21 = jnp.stack([u_mirr, kp_uv21[:, :, 1]], axis=-1)

    out = {
        "image": image,
        "hand_side": jax.nn.one_hot(hand_side, 2),
        "keypoint_xyz21": kp_xyz21,
        "keypoint_vis21": kp_vis21[..., None],
        "keypoint_uv21": kp_uv21,
        "keypoint_scale": scale[:, None],
        "keypoint_xyz_root": root,
        "keypoint_xyz21_rel_normed": rel_normed,
        "keypoint_xyz21_local": local,
        "kp_coord_xyz21_rel_can": can,
        "rot_mat": rot_inv,
        "camera_intrinsic_matrix": K,
    }
    if full_contract:
        # reference dataloaderRHD.py:117-123, 171-187
        hand_mask_any = m > 1
        out["hand_parts"] = m
        out["hand_map_l"] = hand_map_l
        out["hand_map_r"] = hand_map_r
        out["hand_mask"] = jnp.stack([(~hand_mask_any).astype(jnp.int32),
                                      hand_mask_any.astype(jnp.int32)],
                                     axis=-1)

    if hand_crop:
        center_noise = scale_noise = offset_noise = None
        if crop_center_noise:   # dataloaderRHD.py:304-306
            center_noise = 20.0 * jax.random.normal(rngs[2], (B, 2))
        if crop_scale_noise:    # dataloaderRHD.py:308-310
            scale_noise = jax.random.uniform(rngs[3], (B,)) * 0.2 + 1.0
        if crop_offset_noise:   # dataloaderRHD.py:359-361
            offset_noise = 10.0 * jax.random.normal(rngs[4], (B, 2))
        params = compute_crop_params(kp_uv21, kp_vis21, (H, W), crop_size,
                                     center_noise, scale_noise, offset_noise)
        out["image_crop"] = crop_resize_bilinear(image, params, crop_size)
        rhm = crop_resize_nearest(right_hand_mask.astype(jnp.float32),
                                  params, crop_size)
        out["right_hand_mask"] = (rhm > 0).astype(jnp.float32)
        kp_uv21 = crop_uv(kp_uv21, params)
        out["keypoint_uv21"] = kp_uv21
        out["camera_intrinsic_matrix"] = crop_intrinsics(K, params)
    else:
        out["right_hand_mask"] = right_hand_mask.astype(jnp.float32)

    if calculate_scoremap:
        size = (crop_size, crop_size) if hand_crop else (H, W)
        coords_hw = jnp.stack([kp_uv21[..., 1], kp_uv21[..., 0]], axis=-1)
        # measured on v5e (b128, 21x256x256): the Pallas render wins only
        # in isolation (3.7 vs 15.7 ms when XLA must materialise the
        # separable factors); inside real programs XLA's fusion wins --
        # standalone preprocess 9.95 (xla) vs 11.84 ms (pallas), fused
        # preprocess+forward 11.2 vs 16.7 ms (the pallas_call is a fusion
        # barrier).  Default 'off'; 'on' / 'auto' (TPU-only) kept for
        # experimentation on future chips.  Parity kernel-tested to ~5e-6.
        use_pallas = pallas_scoremap == "on" or (
            pallas_scoremap == "auto" and jax.default_backend() == "tpu")
        if use_pallas:
            from ..ops.pallas_kernels import render_gaussian_maps_pallas
            scoremap = render_gaussian_maps_pallas(coords_hw, size, sigma,
                                                   kp_vis21)
        else:
            scoremap = render_gaussian_maps(coords_hw, size, sigma, kp_vis21)
        if scoremap_dropout:
            # torch F.dropout(p=0.8) then *0.8 (dataloaderRHD.py:357-361):
            # kept elements end up scaled by p/(1-p) = 4
            p = 0.8
            keep = jax.random.bernoulli(rngs[5], 1.0 - p, scoremap.shape)
            scoremap = scoremap * keep / (1.0 - p) * p
        out["scoremap"] = scoremap

    if switch_joint_order:
        perm = jnp.asarray(_SWITCH_PERM)
        out["keypoint_vis21"] = out["keypoint_vis21"][:, perm]
        out["keypoint_uv21"] = out["keypoint_uv21"][:, perm]
        out["keypoint_xyz21"] = out["keypoint_xyz21"][:, perm]

    # terminal dataset-output transforms (reference dataloaderRHD.py:464-512)
    # -- like the reference, both branches REPLACE the sample dict with a
    # reduced one, so they are dataset-level capabilities, not trainer
    # inputs (the reference trainer would KeyError on either; Worker
    # rejects them explicitly).
    if scale_to_size:
        # live reference branch (dataloaderRHD.py:464-488): resize the FULL
        # image to scale_target_size and scale keypoint_uv21 by
        # target/full-image -- even though with hand_crop=True the uv is in
        # crop space; the incoherence is the reference's, kept for parity.
        th, tw = scale_target_size
        resized = jax.image.resize(out["image"], (B, th, tw, 3),
                                   method="bilinear")
        uv = out["keypoint_uv21"] * jnp.asarray([tw / W, th / H], jnp.float32)
        return {"image": resized, "keypoint_uv21": uv,
                "keypoint_vis21": out["keypoint_vis21"]}
    if random_crop_to_size:
        # the reference's branch body is commented out (dataloaderRHD.py:
        # 490-512, a bare `pass`); this implements its documented intent:
        # one random crop applied consistently to image + hand_parts +
        # hand_mask, keypoints untouched (so was the sketch).
        S = random_crop_size
        if S > H or S > W:
            raise ValueError(
                f"random_crop_size {S} exceeds the image extent "
                f"({H}x{W}); crops must fit inside the source image")
        oy = jax.random.randint(rngs[6], (B,), 0, H - S + 1)
        ox = jax.random.randint(jax.random.fold_in(rngs[6], 1), (B,), 0,
                                W - S + 1)
        img_c = jax.vmap(lambda a, y, x: jax.lax.dynamic_slice(
            a, (y, x, 0), (S, S, a.shape[-1])))(out["image"], oy, ox)
        parts_c = jax.vmap(lambda a, y, x: jax.lax.dynamic_slice(
            a, (y, x), (S, S)))(m, oy, ox)
        any_c = parts_c > 1
        return {"image": img_c, "hand_parts": parts_c,
                "hand_mask": jnp.stack([(~any_c).astype(jnp.int32),
                                        any_c.astype(jnp.int32)], axis=-1)}

    return out


def yiq_hue_rotate(image: jnp.ndarray, turns: jnp.ndarray) -> jnp.ndarray:
    """Hue rotation in YIQ space, batched; ``turns`` in fraction of a full
    rotation (the reference's hue_aug_max is 0.1).  Operates on the
    pipeline's [-0.5, 0.5] image range."""
    theta = turns * 2.0 * jnp.pi
    rgb = image + 0.5
    to_yiq = jnp.asarray([[0.299, 0.587, 0.114],
                          [0.596, -0.274, -0.322],
                          [0.211, -0.523, 0.312]], jnp.float32)
    from_yiq = jnp.linalg.inv(to_yiq)
    yiq = jnp.einsum("ij,bhwj->bhwi", to_yiq, rgb)
    c, s = jnp.cos(theta), jnp.sin(theta)
    i = yiq[..., 1] * c[:, None, None] - yiq[..., 2] * s[:, None, None]
    q = yiq[..., 1] * s[:, None, None] + yiq[..., 2] * c[:, None, None]
    yiq = jnp.stack([yiq[..., 0], i, q], axis=-1)
    out = jnp.einsum("ij,bhwj->bhwi", from_yiq, yiq)
    return jnp.clip(out, 0.0, 1.0) - 0.5


def scale_to_size(sample: dict, target_hw: tuple[int, int]) -> dict:
    """Resize the full image + uv to ``target_hw``
    (reference dataloaderRHD.py scale_to_size branch; like the reference it
    returns only image/uv/vis)."""
    image = sample["image"]
    B, H, W, C = image.shape
    th, tw = target_hw
    resized = jax.image.resize(image, (B, th, tw, C), method="bilinear")
    uv = sample["keypoint_uv21"]
    uv = jnp.stack([uv[..., 0] * (tw / W), uv[..., 1] * (th / H)], axis=-1)
    return {"image": resized, "keypoint_uv21": uv,
            "keypoint_vis21": sample["keypoint_vis21"]}


def model_input(sample: dict, input_channels: int) -> jnp.ndarray:
    """Assemble the network input per config.input_channels
    (reference trainval.py:293-300); NHWC."""
    if input_channels == 24:
        score = jnp.transpose(sample["scoremap"], (0, 2, 3, 1))
        return jnp.concatenate([sample["image_crop"], score], axis=-1)
    if input_channels == 21:
        return jnp.transpose(sample["scoremap"], (0, 2, 3, 1))
    if input_channels == 3:
        return sample["image_crop"]
    raise ValueError("input_channels are not supported")


class InterHandRawBatch(NamedTuple):
    """Host-parsed InterHand2.6M raw inputs (annotations already remapped to
    RHD joint order and metric units at parse time)."""

    image: jnp.ndarray          # (B, H, W, 3) uint8 RGB (maybe zero-padded)
    keypoint_uv: jnp.ndarray    # (B, 42, 2) float32 (truncated to int on use)
    keypoint_vis: jnp.ndarray   # (B, 42) float/bool
    keypoint_xyz: jnp.ndarray   # (B, 42, 3) float32 metres
    camera_K: jnp.ndarray       # (B, 3, 3) float32
    hand_left: jnp.ndarray      # (B,) bool: annotation hand_type == 'left'
    bbox: jnp.ndarray           # (B, 4) int32 (x, y, w, h), pre-clamped
    orig_wh: jnp.ndarray        # (B, 2) int32 original (W, H) pre-padding


@partial(jax.jit, static_argnames=("crop_size", "sigma", "use_wrist_coord",
                                   "switch_joint_order", "calculate_scoremap",
                                   "hand_crop", "coord_uv_noise",
                                   "scoremap_dropout"))
def preprocess_interhand_batch(raw: InterHandRawBatch, crop_size: int = 256,
                               sigma: float = 25.0,
                               use_wrist_coord: bool = True,
                               switch_joint_order: bool = True,
                               calculate_scoremap: bool = True,
                               hand_crop: bool = True,
                               rng: jnp.ndarray | None = None,
                               coord_uv_noise: bool = False,
                               scoremap_dropout: bool = False) -> dict:
    """Device-side InterHand2.6M pipeline
    (reference dataloaderInterHand2M6.py:180-532, batched).

    Differences from the RHD path: hand side comes from the annotation (no
    segmentation mask), the crop window is the (pre-clamped) bbox, uv
    coordinates are integer-truncated at load like the reference's
    ``torch.tensor(..., dtype=torch.int32)``, and the right_hand_mask is the
    bbox interior inset by 10 px (the reference fabricates it from a zero
    mask, dataloaderInterHand2M6.py:477-489).

    Train-time augmentations are the two the reference's InterHand loader
    applies: ``coord_uv_noise`` -- N(0, 2.5^2) px on all 42 uv coordinates
    (dataloaderInterHand2M6.py:176-177,317-318; NB the reference's branch
    as written would crash, int32 += float noise, so this implements its
    documented intent on float uv) -- and ``scoremap_dropout`` -- torch
    ``F.dropout(p=0.8)`` then ``*= 0.8`` (:549-552), i.e. elements survive
    w.p. 0.2 scaled by p/(1-p) = 4.  Pass ``rng`` when either flag is on.
    """
    aug_on = coord_uv_noise or scoremap_dropout
    if aug_on:
        assert rng is not None, "augmentations need an rng key"
        rngs = list(jax.random.split(rng, 2))
    B, H, W, _ = raw.image.shape
    image = raw.image.astype(jnp.float32) / 255.0 - 0.5
    kp_uv = jnp.trunc(raw.keypoint_uv).astype(jnp.int32)
    kp_vis = raw.keypoint_vis.reshape(B, -1).astype(bool)
    kp_xyz = raw.keypoint_xyz.astype(jnp.float32)
    K = raw.camera_K.astype(jnp.float32)

    if not use_wrist_coord:
        palm_l = 0.5 * (kp_xyz[:, 0] + kp_xyz[:, 12])
        palm_r = 0.5 * (kp_xyz[:, 21] + kp_xyz[:, 33])
        kp_xyz = kp_xyz.at[:, 0].set(palm_l).at[:, 21].set(palm_r)
        palm_uv_l = (kp_uv[:, 0] + kp_uv[:, 12]) // 2
        palm_uv_r = (kp_uv[:, 21] + kp_uv[:, 33]) // 2
        kp_uv = kp_uv.at[:, 0].set(palm_uv_l).at[:, 21].set(palm_uv_r)
        kp_vis = kp_vis.at[:, 0].set(kp_vis[:, 0] | kp_vis[:, 12])
        kp_vis = kp_vis.at[:, 21].set(kp_vis[:, 21] | kp_vis[:, 33])

    if coord_uv_noise:
        # reference order: noise right after the palm block (:317-318),
        # before hand-side selection / mirroring / crop
        kp_uv = kp_uv.astype(jnp.float32) + 2.5 * jax.random.normal(
            rngs[0], (B, 42, 2))

    cond_left = raw.hand_left.astype(bool)
    orig_w = raw.orig_wh[:, 0]
    hand_side = jnp.where(cond_left, 0, 1)
    cl3 = cond_left[:, None, None]
    kp_xyz21 = jnp.where(cl3, kp_xyz[:, :21], kp_xyz[:, 21:])
    kp_xyz21 = jnp.where(cl3, kp_xyz21 * jnp.asarray([-1.0, 1.0, 1.0]),
                         kp_xyz21)
    kp_vis21 = jnp.where(cond_left[:, None], kp_vis[:, :21], kp_vis[:, 21:])
    kp_uv21 = jnp.where(cl3, kp_uv[:, :21], kp_uv[:, 21:])

    root = kp_xyz21[:, 0, :]
    rel = kp_xyz21 - root[:, None, :]
    if use_wrist_coord:
        scale = jnp.sqrt(jnp.sum(rel[:, 12, :] ** 2, axis=-1))
    else:
        scale = jnp.sqrt(jnp.sum((rel[:, 12, :] - rel[:, 11, :]) ** 2,
                                 axis=-1))
    rel_normed = rel / scale[:, None, None]
    local = bone_rel_trafo(rel_normed)
    can, rot = canonical_trafo(rel_normed)
    rot_inv = jnp.swapaxes(rot, -1, -2)

    # mirror about each sample's ORIGINAL width (padding stays put)
    cols = jnp.arange(W)[None, :]
    mirror_col = jnp.clip(orig_w[:, None] - 1 - cols, 0, W - 1)
    col_idx = jnp.where(cond_left[:, None] & (cols < orig_w[:, None]),
                        mirror_col, cols)
    image = jnp.take_along_axis(image, col_idx[:, None, :, None], axis=2)
    u_mirr = jnp.where(cond_left[:, None],
                       orig_w[:, None].astype(kp_uv21.dtype)
                       - kp_uv21[:, :, 0], kp_uv21[:, :, 0])
    kp_uv21 = jnp.stack([u_mirr, kp_uv21[:, :, 1]],
                        axis=-1).astype(jnp.float32)

    out = {
        "image": image,
        "hand_side": jax.nn.one_hot(hand_side, 2),
        "keypoint_xyz21": kp_xyz21,
        "keypoint_vis21": kp_vis21[..., None],
        "keypoint_uv21": kp_uv21,
        "keypoint_scale": scale[:, None],
        "keypoint_xyz_root": root,
        "keypoint_xyz21_rel_normed": rel_normed,
        "keypoint_xyz21_local": local,
        "kp_coord_xyz21_rel_can": can,
        "rot_mat": rot_inv,
        "camera_intrinsic_matrix": K,
    }

    if hand_crop:
        from ..ops.crop import CropParams
        x1 = raw.bbox[:, 0]
        y1 = raw.bbox[:, 1]
        w = raw.bbox[:, 2]
        h = raw.bbox[:, 3]
        params = CropParams(y1=y1, x1=x1, len_y=h, len_x=w,
                            scale_y=crop_size / h.astype(jnp.float32),
                            scale_x=crop_size / w.astype(jnp.float32))
        out["image_crop"] = crop_resize_bilinear(image, params, crop_size)
        # fabricated right_hand_mask: bbox interior inset by 10 px, nearest
        # resized: out[i, j] = 1 iff floor(i*h/S) in [10, h-10)
        offset = 10
        o = jnp.arange(crop_size)
        src_y = (o[None, :] * h[:, None]) // crop_size
        src_x = (o[None, :] * w[:, None]) // crop_size
        my = (src_y >= offset) & (src_y < (h - offset)[:, None])
        mx = (src_x >= offset) & (src_x < (w - offset)[:, None])
        out["right_hand_mask"] = (my[:, :, None] &
                                  mx[:, None, :]).astype(jnp.float32)
        kp_uv21 = crop_uv(kp_uv21, params)
        out["keypoint_uv21"] = kp_uv21
        out["camera_intrinsic_matrix"] = crop_intrinsics(K, params)
    else:
        out["right_hand_mask"] = jnp.zeros((B, H, W), jnp.float32)

    if calculate_scoremap:
        size = (crop_size, crop_size) if hand_crop else (H, W)
        coords_hw = jnp.stack([kp_uv21[..., 1], kp_uv21[..., 0]], axis=-1)
        scoremap = render_gaussian_maps(coords_hw, size, sigma, kp_vis21)
        if scoremap_dropout:
            # torch F.dropout(p=0.8) then *0.8 (:549-552): survivors
            # scaled by p/(1-p) = 4 (same math as the RHD path)
            p = 0.8
            keep = jax.random.bernoulli(rngs[1], 1.0 - p, scoremap.shape)
            scoremap = scoremap * keep / (1.0 - p) * p
        out["scoremap"] = scoremap

    if switch_joint_order:
        perm = jnp.asarray(_SWITCH_PERM)
        out["keypoint_vis21"] = out["keypoint_vis21"][:, perm]
        out["keypoint_uv21"] = out["keypoint_uv21"][:, perm]
        out["keypoint_xyz21"] = out["keypoint_xyz21"][:, perm]

    return out
