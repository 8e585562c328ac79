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


# ---------------------------------------------------------------------------
# 3x3 / stride-2 / pad-1 max-pool BACKWARD (the ResNet stem pool,
# reference network/sub_modules/resnetMANO.py:159 and the torchvision
# trunks).  XLA differentiates ``lax.reduce_window`` into a
# ``select-and-scatter`` HLO that runs SERIALLY over windows -- the
# profiled third-largest sink of the fused train step (two 2.17 ms ops
# = 5.2%, NOTES_r3.md).  The XLA-level argmax rewrite (ops/pooling.py)
# measured 0.54x because its nine interior-padded placements re-read
# the full 128x128x64 stem activation from HBM without fusing.  This
# kernel is that same first-max routing with ALL nine placements kept
# in VMEM: one HBM read of x and dy, one write of dx -- the traffic
# floor for the op.
#
# Layout trick: NHWC with C=64 would waste half of every 128-lane
# register, so the wrapper bit-casts (N, H, W, C) -> (N, H, W/2, 2C)
# (W and C are the two minor dims, so the reshape is free) and the
# kernel works on lane index  l = (w % 2) * C + c.  Window views and
# the scatter then decompose by row/column PARITY:
#   window row 2*oi-1+di  ->  even-row plane (di=1) or odd-row plane
#   (di=0: shifted -1, di=2) of the input;  columns likewise over the
#   packed lane halves.  The backward needs no stored window values at
#   all -- only the 9-way first-max index (torch MaxPool2d tie
#   routing): dx contributions are ``where(idx == k, dy, 0)`` placed
#   by parity, each of the nine used exactly once.
#
# The grid is one program per batch element; inside, output rows are
# processed in H-chunks so the live intermediates stay ~2 MB while the
# x/dy/dx blocks (~4.5 MB double-buffered) dominate VMEM.


def _pool_bwd_chunk(R0, R1, dyp, s, e, Ho, Wo, C, neg):
    """dx parity planes for output-row chunk [2s, 2e).

    R0/R1: even/odd original rows of x, (Ho, Wo, 2C).  dyp: cotangent
    (Ho, Wo, C), unpacked.  Window rows oi in [s, e] inclusive are
    needed (the odd output rows of the chunk pull gradient from window
    row e).  Returns (rows_even, rows_odd), each (e-s, Wo, 2C) f32.

    No sublane-dim concatenates on lane-sliced values anywhere: Mosaic
    refuses offset-mismatched concat operands ("result/input offset
    mismatch on non-concat dimension"), so every +-1 shift of a lane
    half is a static ``jnp.roll`` + iota edge mask instead.  Axis-0
    concats are over the untiled dim (offset-free) and stay.
    """
    n_ext = e - s + 1

    def rows(arr, lo, hi):
        """arr[lo:hi] along axis 0 with -inf padding outside [0, Ho)."""
        pads_lo = max(0, -lo)
        pads_hi = max(0, hi - Ho)
        body = arr[max(lo, 0):min(hi, Ho)]
        parts = []
        if pads_lo:
            parts.append(jnp.full((pads_lo,) + arr.shape[1:], neg,
                                  arr.dtype))
        parts.append(body)
        if pads_hi:
            parts.append(jnp.full((pads_hi,) + arr.shape[1:], neg,
                                  arr.dtype))
        return jnp.concatenate(parts, 0) if len(parts) > 1 else body

    # window-row planes over oi in [s, e]:  di=0 -> orig row 2oi-1,
    # di=1 -> 2oi, di=2 -> 2oi+1.  f32 throughout: Mosaic's vector
    # compare ("Target does not support this comparison") rejects the
    # bf16/int32 mixes, and f32 compare/select is the supported path.
    r_di = tuple(r.astype(jnp.float32) for r in
                 (rows(R1, s - 1, e), rows(R0, s, e + 1),
                  rows(R1, s, e + 1)))

    def col0(v3):
        # tpu.iota must be integer-typed; compare in f32 (supported)
        return jax.lax.broadcasted_iota(
            jnp.int32, v3.shape, 1).astype(jnp.float32)

    def view(di, dj):
        r = r_di[di]
        E, O = r[..., :C], r[..., C:]
        if dj == 0:  # orig col 2oj-1 = odd col (oj-1), "-inf" at oj=0
            v = jnp.roll(O, 1, axis=1)
            keep = (col0(v) != 0).astype(jnp.float32)
            # arithmetic blend (no i1 select): finite f32 lowest stands
            # in for -inf -- it loses every max to the always-real
            # center element, and 0 * finfo.min stays finite (an actual
            # -inf here would make 0 * (-inf) = NaN and silently drop
            # window (0,0)'s gradient)
            return v * keep + jnp.finfo(jnp.float32).min * (1.0 - keep)
        return E if dj == 1 else O

    # pass 1: 9-way first-max index (strict > keeps the FIRST maximal
    # element in row-major window order -- torch MaxPool2d routing).
    # All selects are FLOAT-mask arithmetic: Mosaic cannot relayout the
    # i1 vectors a jnp.where select needs when its operands carry
    # mismatched layouts ("Invalid relayout ... replicated in
    # destination"), so each comparison is consumed by one immediate
    # convert and the blends are multiplies.  jnp.maximum is -inf-safe
    # where m + t*(v-m) would NaN on (-inf) - (-inf).
    m = view(0, 0)
    idx = jnp.zeros(m.shape, jnp.float32)
    for k in range(1, 9):
        v = view(*divmod(k, 3))
        t = (v > m).astype(jnp.float32)
        m = jnp.maximum(m, v)
        idx = idx + t * (k - idx)
    # cotangent rows [s, e] (window row Ho does not exist -> zero)
    d = dyp[s:min(e + 1, Ho)].astype(jnp.float32)
    if e + 1 > Ho:
        d = jnp.concatenate(
            [d, jnp.zeros((e + 1 - Ho,) + d.shape[1:], d.dtype)], 0)
    dy_ext = d

    # pass 2: place each window's gradient by parity.  Output row
    # i = 2a+pi is covered by window rows oi = a+1 (di=0) / a (di=1,2);
    # columns likewise -- each contribution is used exactly once.
    def c(k):
        return (idx == k).astype(jnp.float32) * dy_ext

    def shj(v):  # v[a, b+1], zero past the last window column
        r = jnp.roll(v, -1, axis=1)
        return (col0(r) != Wo - 1).astype(jnp.float32) * r

    n = e - s
    p00 = c(4)[:n]
    p01 = shj(c(3))[:n] + c(5)[:n]
    p10 = c(1)[1:] + c(7)[:n]
    p11 = shj(c(0))[1:] + c(2)[1:] + shj(c(6))[:n] + c(8)[:n]
    rows_even = jnp.concatenate([p00, p01], -1)
    rows_odd = jnp.concatenate([p10, p11], -1)
    return rows_even, rows_odd


def _pool_bwd_kernel(x_ref, dy_ref, out_ref, *, H, W, C, n_chunks):
    Ho, Wo = H // 2, W // 2
    x3 = x_ref[0]                              # (H, Wo, 2C) packed
    xh = x3.reshape(Ho, 2, Wo, 2 * C)
    R0, R1 = xh[:, 0], xh[:, 1]                # even / odd orig rows
    dyp = dy_ref[0]                            # (Ho, Wo, C) unpacked
    # finite stand-in for -inf: every pad loses the max to the
    # always-real center element, and it survives the arithmetic
    # blends (0 * -inf would NaN).  finfo(dtype).min is the largest
    # finite magnitude the dtype can hold -- a hardcoded -3.4e38 is NOT
    # representable in bf16 (max finite ~3.3895e38) and would round to
    # -inf, NaN-poisoning window (0,0)'s routing under bf16 compute
    neg = jnp.asarray(jnp.finfo(x3.dtype).min, x3.dtype)
    ch = Ho // n_chunks
    for h in range(n_chunks):
        s, e = h * ch, (h + 1) * ch if h < n_chunks - 1 else Ho
        re_, ro = _pool_bwd_chunk(R0, R1, dyp, s, e, Ho, Wo, C, neg)
        outc = jnp.stack([re_, ro], 1).reshape(2 * (e - s), Wo, 2 * C)
        out_ref[0, 2 * s:2 * e] = outc.astype(out_ref.dtype)


def max_pool_3x3s2p1_bwd_pallas(x: jnp.ndarray, dy: jnp.ndarray,
                                interpret: bool = False) -> jnp.ndarray:
    """dx of ``nn.max_pool(x, (3,3), (2,2), pad 1)`` given cotangent dy.

    x: (N, H, W, C) float, H even, W % 4 == 0; dy: (N, H//2, W//2, C).
    First-max tie routing (torch MaxPool2d); f32 accumulation of the
    <=4 overlapping-window terms per input element, result in x.dtype.
    """
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 4 == 0, (H, W)
    Ho, Wo = H // 2, W // 2
    L = 2 * C
    xr = x.reshape(N, H, Wo, L)                # free: (W, C) minor dims
    # dy stays UNPACKED (Ho, Wo, C): its lanes waste half a register at
    # C=64 but the DMA reads only real bytes, and unpacked it indexes
    # directly by window column -- no Mosaic-hostile lane interleave
    dyr = dy.astype(x.dtype)
    # ~0.5 MB of live intermediates per chunk at the stem's 128x128x64
    n_chunks = max(1, Ho // 16)
    kernel = functools.partial(_pool_bwd_kernel, H=H, W=W, C=C,
                               n_chunks=n_chunks)
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, Wo, L), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo, C), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Wo, L), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, Wo, L), x.dtype),
        interpret=interpret,
    )(xr, dyr)
    return out.reshape(N, H, W, C)


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
