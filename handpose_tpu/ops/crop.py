"""Visibility-driven hand crop with fixed-shape device execution.

TPU-native redesign of the crop logic in reference
dataloaderRHD.py:293-431.  The reference computes a data-dependent crop
window per sample with python ``int()`` truncation and then runs
``image[y1:y2, x1:x2]`` + ``F.interpolate(bilinear)`` on CPU.  Dynamic
slices don't jit, so here the crop is expressed as a *fixed-shape* gather:

1. :func:`compute_crop_params` reproduces the reference's window arithmetic
   (including the int-truncation quantisation) entirely in float/int32 jnp;
2. :func:`crop_resize_bilinear` builds the 256 source coordinates per output
   row/col (torch ``align_corners=False`` convention with the leading
   ``max(0, .)`` clamp of aten/UpSample.h) and performs two separable
   batched gathers + lerps.  Same math, static shapes, device-resident.

Everything is batched; per-sample python control flow from the reference
becomes ``jnp.where`` masking.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CropParams(NamedTuple):
    y1: jnp.ndarray        # (B,) int32 crop top (pixels)
    x1: jnp.ndarray        # (B,) int32 crop left
    len_y: jnp.ndarray     # (B,) int32 crop height
    len_x: jnp.ndarray     # (B,) int32 crop width
    scale_y: jnp.ndarray   # (B,) float crop_size / len_y
    scale_x: jnp.ndarray   # (B,) float crop_size / len_x


def compute_crop_params(keypoint_uv21: jnp.ndarray,
                        keypoint_vis21: jnp.ndarray,
                        image_hw: tuple[int, int],
                        crop_size: int,
                        center_noise: jnp.ndarray | None = None,
                        scale_noise: jnp.ndarray | None = None,
                        offset_noise: jnp.ndarray | None = None
                        ) -> CropParams:
    """Reproduce reference dataloaderRHD.py:297-343 (window selection).

    Args:
      keypoint_uv21: (B, 21, 2) pixel (u, v).
      keypoint_vis21: (B, 21) or (B, 21, 1) bool.
      image_hw: static (H, W) of the source image.
      crop_size: static output size (256).
      center_noise: optional (B, 2) (y, x) noise added to the crop center
        before the extent computation (crop_center_noise,
        dataloaderRHD.py:304-306).
      scale_noise: optional (B,) multiplicative scale jitter in [1.0, 1.2]
        (crop_scale_noise, dataloaderRHD.py:308-310).
      offset_noise: optional (B, 2) noise added after the size computation
        (crop_offset_noise, dataloaderRHD.py:359-361).
    """
    H, W = image_hw
    u = keypoint_uv21[..., 0]
    v = keypoint_uv21[..., 1]
    vis = keypoint_vis21.reshape(u.shape).astype(bool)

    # crop center: mean of keypoints strictly inside the image
    in_img = (u > 0) & (u < W) & (v > 0) & (v < H)
    n_in = jnp.sum(in_img, axis=-1)
    mean_u = jnp.sum(jnp.where(in_img, u, 0.0), axis=-1) / jnp.maximum(n_in, 1)
    mean_v = jnp.sum(jnp.where(in_img, v, 0.0), axis=-1) / jnp.maximum(n_in, 1)
    has_in = n_in > 0
    center_y = jnp.where(has_in, mean_v, crop_size / 2.0)
    center_x = jnp.where(has_in, mean_u, crop_size / 2.0)
    if center_noise is not None:
        center_y = center_y + center_noise[:, 0]
        center_x = center_x + center_noise[:, 1]

    # crop extent: min/max over *visible* keypoints (y=v, x=u),
    # clamped to [0, image_size] (dataloaderRHD.py:311-320)
    big = jnp.float32(1e9)
    n_vis = jnp.sum(vis, axis=-1)
    min_y = jnp.maximum(jnp.min(jnp.where(vis, v, big), axis=-1), 0.0)
    min_x = jnp.maximum(jnp.min(jnp.where(vis, u, big), axis=-1), 0.0)
    max_y = jnp.minimum(jnp.max(jnp.where(vis, v, -big), axis=-1), float(H))
    max_x = jnp.minimum(jnp.max(jnp.where(vis, u, -big), axis=-1), float(W))
    has_vis = n_vis > 0
    min_y = jnp.where(has_vis, min_y, 0.0)
    min_x = jnp.where(has_vis, min_x, 0.0)
    max_y = jnp.where(has_vis, max_y, float(H))
    max_x = jnp.where(has_vis, max_x, float(W))

    ext_y = jnp.maximum(max_y - center_y, center_y - min_y)
    ext_x = jnp.maximum(max_x - center_x, center_x - min_x)
    crop_size_best = 2.0 * jnp.maximum(ext_y, ext_x) + 20.0
    crop_size_best = jnp.clip(crop_size_best, 50.0, 500.0)

    scale = jnp.clip(crop_size / crop_size_best, 1.0, 10.0)
    if scale_noise is not None:
        scale = scale * scale_noise
    if offset_noise is not None:
        center_y = center_y + offset_noise[:, 0]
        center_x = center_x + offset_noise[:, 1]
    # int() truncation of python / torch (dataloaderRHD.py:364)
    css = jnp.trunc(crop_size / scale).astype(jnp.int32)

    # "if > 0 else 0" in the reference is equivalent to clamping at 0.
    # Also clamp the start INSIDE the image and the window length to >= 1:
    # with center noise the noisy center can land past the border
    # (y1 == H), where the reference fails loudly (empty slice ->
    # F.interpolate raises) but an unclamped port would emit len 0 ->
    # scale inf and silently poison the step.
    y1 = jnp.clip(jnp.trunc(center_y - css // 2).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(jnp.trunc(center_x - css // 2).astype(jnp.int32), 0, W - 1)
    y2 = jnp.where(y1 + css < H, y1 + css, H)
    x2 = jnp.where(x1 + css < W, x1 + css, W)

    len_y = jnp.maximum(y2 - y1, 1)
    len_x = jnp.maximum(x2 - x1, 1)
    scale_y = crop_size / len_y.astype(jnp.float32)
    scale_x = crop_size / len_x.astype(jnp.float32)
    return CropParams(y1, x1, len_y, len_x, scale_y, scale_x)


def _source_coords(starts: jnp.ndarray, lengths: jnp.ndarray,
                   out_size: int, max_idx: int):
    """Per-sample bilinear source indices/weights along one axis.

    torch align_corners=False: f = max(0, (o+0.5) * len/out - 0.5),
    i0 = floor(f) clamped, i1 = min(i0+1, len-1); global index += start.
    """
    o = jnp.arange(out_size, dtype=jnp.float32)[None, :]           # (1, S)
    lf = lengths.astype(jnp.float32)[:, None]                       # (B, 1)
    f = jnp.maximum((o + 0.5) * lf / out_size - 0.5, 0.0)
    i0 = jnp.floor(f).astype(jnp.int32)
    i0 = jnp.minimum(i0, lengths[:, None] - 1)
    i1 = jnp.minimum(i0 + 1, lengths[:, None] - 1)
    w = f - i0.astype(jnp.float32)
    g0 = jnp.clip(starts[:, None] + i0, 0, max_idx - 1)
    g1 = jnp.clip(starts[:, None] + i1, 0, max_idx - 1)
    return g0, g1, w


def crop_resize_bilinear(images: jnp.ndarray, params: CropParams,
                         out_size: int) -> jnp.ndarray:
    """Batched crop + bilinear resize, fixed shapes.

    Args:
      images: (B, H, W, C) float.
    Returns:
      (B, out_size, out_size, C); matches torch
      ``F.interpolate(img[y1:y2, x1:x2], (S, S), bilinear,
      align_corners=False)`` (dataloaderRHD.py:373-377).
    """
    B, H, W, C = images.shape
    y0, y1i, wy = _source_coords(params.y1, params.len_y, out_size, H)
    x0, x1i, wx = _source_coords(params.x1, params.len_x, out_size, W)

    # gather rows: (B, S, W, C)
    rows0 = jnp.take_along_axis(images, y0[:, :, None, None], axis=1)
    rows1 = jnp.take_along_axis(images, y1i[:, :, None, None], axis=1)
    rows = rows0 + (rows1 - rows0) * wy[:, :, None, None]
    # gather cols: (B, S, S, C)
    cols0 = jnp.take_along_axis(rows, x0[:, None, :, None], axis=2)
    cols1 = jnp.take_along_axis(rows, x1i[:, None, :, None], axis=2)
    return cols0 + (cols1 - cols0) * wx[:, None, :, None]


def crop_resize_nearest(images: jnp.ndarray, params: CropParams,
                        out_size: int) -> jnp.ndarray:
    """Nearest-neighbour variant (masks; dataloaderRHD.py:381-387).

    torch 'nearest': src = floor(o * len/out).
    """
    B, H, W = images.shape[:3]
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    o = jnp.arange(out_size, dtype=jnp.float32)[None, :]

    def idx(starts, lengths, max_idx):
        f = jnp.floor(o * lengths.astype(jnp.float32)[:, None] / out_size)
        i = jnp.minimum(f.astype(jnp.int32), lengths[:, None] - 1)
        return jnp.clip(starts[:, None] + i, 0, max_idx - 1)

    gy = idx(params.y1, params.len_y, H)
    gx = idx(params.x1, params.len_x, W)
    rows = jnp.take_along_axis(images, gy[:, :, None, None], axis=1)
    out = jnp.take_along_axis(rows, gx[:, None, :, None], axis=2)
    return out[..., 0] if squeeze else out


def crop_intrinsics(K: jnp.ndarray, params: CropParams) -> jnp.ndarray:
    """Rewrite camera intrinsics for the crop (dataloaderRHD.py:330-339).

    K' = T(-x1*sx, -y1*sy) @ diag(sx, sy, 1) @ K, batched.
    """
    B = K.shape[0]
    sx = params.scale_x
    sy = params.scale_y
    tx = params.x1.astype(jnp.float32) * sx
    ty = params.y1.astype(jnp.float32) * sy
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    M = jnp.stack([
        jnp.stack([sx, z, -tx], axis=-1),
        jnp.stack([z, sy, -ty], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)                                             # (B, 3, 3)
    return M @ K


def crop_uv(uv21: jnp.ndarray, params: CropParams) -> jnp.ndarray:
    """Map pixel coords into the crop (dataloaderRHD.py:391-394)."""
    u = (uv21[..., 0] - params.x1[:, None].astype(jnp.float32)) * params.scale_x[:, None]
    v = (uv21[..., 1] - params.y1[:, None].astype(jnp.float32)) * params.scale_y[:, None]
    return jnp.stack([u, v], axis=-1)
