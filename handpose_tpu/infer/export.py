"""Model export for serving: serialize a jitted forward to StableHLO.

Deployment capability beyond the reference (which serves nothing): bundle
a zoo model's inference forward -- weights baked in -- as a portable
`jax.export` artifact that a serving process can load and run without the
framework, python model code, or checkpoint plumbing.

    blob = export_forward(cfg, variables)          # bytes
    fn = load_exported(blob)                        # callable
    xyz, uv = fn(images, K, scale, root)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..config import Config
from ..models import build_model


def export_forward(cfg: Config, variables, batch_size: int,
                   mano=None) -> bytes:
    """Serialize the model's inference forward (weights closed over).

    Returns the serialized artifact bytes; inputs are
    (images (B,H,W,C), K (B,3,3), scale (B,1), root (B,3)).
    """
    model = build_model(cfg, is_inference=True, mano=mano)
    H, W = cfg.input_img_shape

    def forward(img, K, scale, root):
        # the 'diffusion' rng stream serves DiffusionHandPose's in-forward
        # DDIM sampling (zoo.py::DiffusionHandPose); a fixed key makes the
        # exported artifact deterministic (and is ignored by every other
        # model)
        out = model.apply(variables, img, K, scale, root, train=False,
                          rngs={"diffusion": jax.random.PRNGKey(cfg.seed)})
        xyz = out.xyz if out.xyz is not None else jnp.zeros(
            (img.shape[0], cfg.keypoint_num, 3))
        uv = out.uv if out.uv is not None else jnp.zeros(
            (img.shape[0], cfg.keypoint_num, 2))
        return xyz, uv

    args = (
        jax.ShapeDtypeStruct((batch_size, H, W, cfg.input_channels),
                             jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 3, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 1), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 3), jnp.float32),
    )
    exported = jax_export.export(jax.jit(forward))(*args)
    return exported.serialize()


def export_fused_pipeline(cfg: Config, variables, batch_size: int,
                          image_size: Tuple[int, int] = (320, 320),
                          mano=None) -> bytes:
    """Serialize the FUSED serving program: raw sample -> device
    preprocessing (dominant-hand select, crop, intrinsics rewrite,
    scoremaps) + model forward, in one StableHLO artifact.

    This is the program the throughput/b1-latency benches measure
    (bench.py::make_fused_infer_pipe) -- the whole RHD-format epoch path
    minus host decode -- exported so a serving process replays it with no
    framework import.  Inputs mirror ``data.preprocess.RawBatch``:
    (image u8 (B,H,W,3), mask u8 (B,H,W), keypoint_uv (B,42,2),
    keypoint_vis (B,42), keypoint_xyz (B,42,3), K (B,3,3)); outputs
    (xyz (B,21,3), uv (B,21,2)).
    """
    from ..data.preprocess import RawBatch, model_input, preprocess_batch

    model = build_model(cfg, is_inference=True, mano=mano)
    H, W = image_size

    def forward(image, mask, kp_uv, kp_vis, kp_xyz, K):
        raw = RawBatch(image=image, mask=mask, keypoint_uv=kp_uv,
                       keypoint_vis=kp_vis, keypoint_xyz=kp_xyz,
                       camera_K=K)
        sample = preprocess_batch(raw, crop_size=cfg.crop_size,
                                  sigma=cfg.sigma,
                                  switch_joint_order=cfg.
                                  joint_order_switched)
        inp = model_input(sample, cfg.input_channels)
        out = model.apply(variables, inp,
                          sample["camera_intrinsic_matrix"],
                          sample["keypoint_scale"],
                          sample["keypoint_xyz_root"], train=False,
                          rngs={"diffusion":
                                jax.random.PRNGKey(cfg.seed)})
        xyz = out.xyz if out.xyz is not None else jnp.zeros(
            (image.shape[0], cfg.keypoint_num, 3))
        uv = out.uv if out.uv is not None else jnp.zeros(
            (image.shape[0], cfg.keypoint_num, 2))
        return xyz, uv

    B = batch_size
    args = (
        jax.ShapeDtypeStruct((B, H, W, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
        jax.ShapeDtypeStruct((B, 42, 2), jnp.float32),
        jax.ShapeDtypeStruct((B, 42), jnp.float32),
        jax.ShapeDtypeStruct((B, 42, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, 3, 3), jnp.float32),
    )
    exported = jax_export.export(jax.jit(forward))(*args)
    return exported.serialize()


def load_exported_pipeline(blob: bytes):
    """Deserialize an ``export_fused_pipeline`` artifact."""
    exported = jax_export.deserialize(blob)

    def fn(image, mask, kp_uv, kp_vis, kp_xyz, K):
        return exported.call(
            jnp.asarray(image, jnp.uint8), jnp.asarray(mask, jnp.uint8),
            jnp.asarray(kp_uv, jnp.float32),
            jnp.asarray(kp_vis, jnp.float32),
            jnp.asarray(kp_xyz, jnp.float32), jnp.asarray(K, jnp.float32))

    return fn


def load_exported(blob: bytes):
    """Deserialize an exported forward into a callable."""
    exported = jax_export.deserialize(blob)

    def fn(img, K, scale, root):
        return exported.call(jnp.asarray(img, jnp.float32),
                             jnp.asarray(K, jnp.float32),
                             jnp.asarray(scale, jnp.float32),
                             jnp.asarray(root, jnp.float32))

    return fn


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported_file(path: str):
    with open(path, "rb") as f:
        return load_exported(f.read())
