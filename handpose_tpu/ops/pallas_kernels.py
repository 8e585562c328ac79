"""Pallas TPU kernels for the hot preprocessing ops.

The Gaussian scoremap render writes B*K*H*W floats (for the default
bs=128 batch: 128*21*256*256*4B = 687 MB) -- it is purely HBM-bandwidth
bound.  The XLA version materialises the two separable factors and their
outer product; the Pallas kernel regenerates both factors from 2*(H+W)
scalars inside VMEM and streams only the output, hitting the write-
bandwidth roofline with no intermediate traffic.

Grid: one program per (batch, keypoint) pair; each program computes its
(H, W) map from three scalars (cy, cx, cond) with broadcasted iota on the
VPU.  Layout and gating match :func:`handpose_tpu.ops.heatmap.
render_gaussian_maps` exactly (same int-truncation, bounds and visibility
conditions), verified by tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scoremap_kernel(cy_ref, cx_ref, cond_ref, out_ref, *, H, W, inv_s2):
    i = pl.program_id(0)
    cy = cy_ref[i]
    cx = cx_ref[i]
    cond = cond_ref[i]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    dy = ys - cy
    dx = xs - cx
    out_ref[0] = jnp.exp(-(dy * dy + dx * dx) * inv_s2) * cond


def render_gaussian_maps_pallas(coords_hw: jnp.ndarray,
                                output_size: tuple[int, int],
                                sigma: float,
                                valid: jnp.ndarray | None = None,
                                interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas replacement for ops.heatmap.render_gaussian_maps.

    Args/returns identical to the jnp version: (B, K, 2) (row, col) coords
    [+ (B, K[,1]) visibility] -> (B, K, H, W) float32 maps.
    """
    H, W = output_size
    B, K = coords_hw.shape[:2]
    coords = coords_hw.astype(jnp.int32).astype(jnp.float32)
    cy = coords[..., 0].reshape(-1)
    cx = coords[..., 1].reshape(-1)
    if valid is not None:
        v = valid.reshape(B, K).astype(jnp.float32)
        cond_val = v > 0.5
    else:
        cond_val = jnp.ones((B, K), bool)
    cyk = coords[..., 0]
    cxk = coords[..., 1]
    cond_in = ((cyk < H - 1) & (cyk > 0)) & ((cxk < W - 1) & (cxk > 0))
    cond = (cond_val & cond_in).astype(jnp.float32).reshape(-1)

    inv_s2 = float(1.0 / (sigma ** 2))
    kernel = functools.partial(_scoremap_kernel, H=H, W=W, inv_s2=inv_s2)
    out = pl.pallas_call(
        kernel,
        grid=(B * K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * K, H, W), jnp.float32),
        interpret=interpret,
    )(cy, cx, cond)
    return out.reshape(B, K, H, W)
