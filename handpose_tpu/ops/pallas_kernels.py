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


# ---------------------------------------------------------------------------
# One-pass shifted batch moments (ShiftedBatchNorm's hot reduction).
#
# The training-mode BatchNorm moment computation reads the layer input
# (up to 256x128x128x64 bf16 at the flagship's stem) from HBM; XLA
# schedules the two sibling reductions of the shifted form
# (sum(x-shift), sum((x-shift)^2)) as two HBM passes on v5e (measured
# round 3: 'shifted' recovered only +2.7% of 'fast''s +11.6% train-step
# win over the two-pass 'stable').  This kernel computes BOTH moments in
# ONE pass: grid over row tiles of the (N, C) view, f32 accumulation
# into a (2, C) output block that every grid step revisits (TPU grid
# steps run sequentially on the core, so read-modify-write is safe).
#
# Numerics match the jnp shifted form (same f32 accumulation of the
# same d = x - shift terms, tile-chunked reduction order); the shift
# identity keeps the downstream cancellation benign (nn/norm.py).


def _moments_kernel(x_ref, shift_ref, out_ref, *, n_rows, tile_rows):
    i = pl.program_id(0)
    d = x_ref[:].astype(jnp.float32) - shift_ref[:]       # (tile, C)
    # mask tail rows of the final (padded) tile
    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + i * tile_rows
    d = jnp.where(row < n_rows, d, 0.0)
    s = jnp.sum(d, axis=0)
    ss = jnp.sum(d * d, axis=0)

    @pl.when(i == 0)
    def _():
        out_ref[0, :] = s
        out_ref[1, :] = ss

    @pl.when(i > 0)
    def _():
        out_ref[0, :] = out_ref[0, :] + s
        out_ref[1, :] = out_ref[1, :] + ss


def _moments_pallas_raw(x2d: jnp.ndarray, shift: jnp.ndarray,
                        interpret: bool = False):
    N, C = x2d.shape
    tile = min(1024, max(16, -(-N // 16) * 16 if N < 1024 else 1024))
    grid = (-(-N // tile),)
    kernel = functools.partial(_moments_kernel, n_rows=N, tile_rows=tile)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C), jnp.float32),
        interpret=interpret,
    )(x2d, shift.astype(jnp.float32).reshape(1, C))
    return out[0], out[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_shifted_moments(x2d: jnp.ndarray, shift: jnp.ndarray,
                          interpret: bool = False):
    """(sum(x - shift), sum((x - shift)^2)) over rows, one HBM pass.

    x2d: (N, C) float; shift: (C,) float32.  Returns two (C,) float32.
    Differentiable (custom VJP below: the moment gradients are a single
    fused elementwise pass XLA derives no worse than hand-written).
    """
    return _moments_pallas_raw(x2d, shift, interpret)


def _moments_fwd(x2d, shift, interpret):
    s, ss = _moments_pallas_raw(x2d, shift, interpret)
    return (s, ss), (x2d, shift, s)


def _moments_bwd(interpret, res, g):
    x2d, shift, s = res
    gs, gss = g
    n = x2d.shape[0]
    d = x2d.astype(jnp.float32) - shift[None, :]
    dx = (gs[None, :] + 2.0 * d * gss[None, :]).astype(x2d.dtype)
    dshift = (-float(n) * gs - 2.0 * s * gss).astype(shift.dtype)
    return dx, dshift


fused_shifted_moments.defvjp(_moments_fwd, _moments_bwd)
