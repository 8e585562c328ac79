"""Max pooling with an argmax-routed custom VJP.

The reference trunks pool with 3x3 / stride-2 / pad-1 max pooling
(reference network/sub_modules/resnetMANO.py:159 and the torchvision
ResNets used by resNetFeatureExtractor.py / PoseViewPointNetwork.py).
flax's ``nn.max_pool`` differentiates through ``lax.reduce_window``,
whose gradient lowers to a ``select-and-scatter`` HLO -- the profiled
third-largest time sink of the fused train step on v5e (two 2.17 ms ops
per step = 5.2%, see ``tools/profile_train_step.py`` / NOTES_r3.md).

``max_pool_argmax_grad`` runs the IDENTICAL forward program
(``lax.reduce_window`` via ``nn.max_pool``) but routes the backward
through a recomputed in-window argmax: the cotangent is scattered with
kh*kw masked interior-padded placements that XLA fuses into one
elementwise pass instead of the serial select-and-scatter.

Tie semantics match torch's MaxPool2d backward exactly: the FIRST
maximal element in row-major window order receives the whole gradient
(``jnp.argmax`` returns the first occurrence). ``tests/test_pooling.py``
asserts the gradient SUPPORT SET (tie routing) equals both
``nn.max_pool``'s and torch's on tie-heavy inputs; values agree to
fp-addition-reassociation ulps (elements under several overlapping
windows accumulate in implementation-defined order -- torch, XLA
select-and-scatter, and this kernel each use their own, ~2e-7 apart
in float32).

Measured negative result (v5e, tools/bench_pool_grad.py, b256 flagship
fused train step): 'argmax' 1551.6 img/s vs 'native' 2876.6 img/s
(0.54x) -- the recomputed-argmax + 9-placement backward costs far more
than the two 2.17 ms select-and-scatter ops it replaces, because the
forward activations must be re-read at full 128x128x64 resolution and
the nine interior-padded placements defeat fusion into a single pass on
this XLA version. The default stays 'native'; 'argmax' is kept as a
measured alternative should select-and-scatter regress on a future
compiler.

The Pallas VMEM kernel ('pallas', ops/pallas_kernels.py) is the second
measured negative (v5e round 5, same A/B): 1425.4 img/s vs native
3282.3 (0.43x) IN CONTEXT, despite being ~par with native in isolation
at the stem shape (1.89 vs 1.72 ms at b32 bf16).  The pallas_call is a
fusion barrier: x and dy must materialise to HBM as standalone arrays
instead of fusing the scatter into the surrounding backward fusions,
which costs far more than the serial select-and-scatter it removes.
Both alternatives stay as tested, documented oracles; 'native' is the
measured default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool_argmax_grad(x, window_shape=(3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1))):
    """``nn.max_pool`` (NHWC) with a fused argmax-routed gradient."""
    return nn.max_pool(x, window_shape, strides=strides, padding=padding)


def _window_views(x, window_shape, strides, padding):
    """Stack the kh*kw strided window views of the padded input.

    Returns (views, geometry) where views has shape
    (kh*kw, N, H_out, W_out, C) in row-major window order.
    """
    kh, kw = window_shape
    sh, sw = strides
    (plh, phh), (plw, phw) = padding
    N, H, W, C = x.shape
    Hp, Wp = H + plh + phh, W + plw + phw
    Ho, Wo = (Hp - kh) // sh + 1, (Wp - kw) // sw + 1
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                      else jnp.iinfo(x.dtype).min, x.dtype)
    xp = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)),
                 constant_values=neg)
    views = [xp[:, di:di + sh * (Ho - 1) + 1:sh,
                dj:dj + sw * (Wo - 1) + 1:sw, :]
             for di in range(kh) for dj in range(kw)]
    return jnp.stack(views), (Hp, Wp, Ho, Wo)


def _fwd(x, window_shape, strides, padding):
    y = nn.max_pool(x, window_shape, strides=strides, padding=padding)
    return y, x


def _bwd(window_shape, strides, padding, x, g):
    kh, kw = window_shape
    sh, sw = strides
    (plh, _), (plw, _) = padding
    N, H, W, C = x.shape
    views, (Hp, Wp, Ho, Wo) = _window_views(x, window_shape, strides,
                                            padding)
    # First maximal element in row-major window order gets the gradient
    # (jnp.argmax -> first occurrence), matching torch MaxPool2d.
    idx = jnp.argmax(views, axis=0)
    zero = jnp.zeros((), g.dtype)
    dxp = jnp.zeros((N, Hp, Wp, C), g.dtype)
    for k in range(kh * kw):
        di, dj = divmod(k, kw)
        contrib = jnp.where(idx == k, g, zero)
        # Place contrib[i, j] at padded position (di + sh*i, dj + sw*j):
        # interior padding = stride - 1, low padding = window offset.
        dxp = dxp + lax.pad(
            contrib, zero,
            ((0, 0, 0),
             (di, Hp - di - (sh * (Ho - 1) + 1), sh - 1),
             (dj, Wp - dj - (sw * (Wo - 1) + 1), sw - 1),
             (0, 0, 0)))
    return (dxp[:, plh:plh + H, plw:plw + W, :],)


max_pool_argmax_grad.defvjp(_fwd, _bwd)


# the one pooling geometry every reference trunk uses (3x3, stride 2,
# pad 1) -- single source of truth for both implementations below
STEM_POOL = dict(window_shape=(3, 3), strides=(2, 2),
                 padding=((1, 1), (1, 1)))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_pallas_grad(x, interpret: bool = False):
    """``nn.max_pool`` 3x3/s2/p1 whose backward is the Pallas kernel.

    Forward is the IDENTICAL ``lax.reduce_window`` program; the VJP
    routes through ``ops.pallas_kernels.max_pool_3x3s2p1_bwd_pallas``
    (first-max torch tie routing, one HBM pass) instead of XLA's serial
    ``select-and-scatter``.  Requires H even / W % 4 == 0 (the stem's
    128x128 always is); reverse-mode only, like 'argmax'.
    """
    return nn.max_pool(x, STEM_POOL["window_shape"],
                       strides=STEM_POOL["strides"],
                       padding=STEM_POOL["padding"])


def _pallas_fwd(x, interpret):
    return max_pool_pallas_grad(x, interpret), x


def _pallas_bwd(interpret, x, g):
    from .pallas_kernels import max_pool_3x3s2p1_bwd_pallas
    return (max_pool_3x3s2p1_bwd_pallas(x, g, interpret=interpret),)


max_pool_pallas_grad.defvjp(_pallas_fwd, _pallas_bwd)


def pallas_pool_envelope_ok(shape) -> bool:
    """Shapes the Mosaic-compiled pool backward is validated for.

    H even / W % 4 == 0 are hard layout requirements of the parity
    repack; C >= 64 excludes the known Mosaic corner at tiny channel
    counts (an i1 relayout failure at C=8, NOTES_r4.md) -- production
    stems are C=64.  Interpret mode (off-TPU) has no such corner and
    is gated only by the hard asserts in the kernel wrapper.
    """
    if len(shape) != 4:
        return False
    _, H, W, C = shape
    return H % 2 == 0 and W % 4 == 0 and C >= 64


def stem_max_pool(x, impl: str = "native"):
    """The ResNet-stem 3x3/s2/p1 max pool with a selectable gradient.

    'native' = flax nn.max_pool (select-and-scatter gradient);
    'argmax' = the fused argmax-routed VJP above (measured 0.54x,
    kept as oracle); 'pallas' = identical forward with the one-pass
    Pallas backward kernel.  Forward programs are identical across all
    three; eval/serving is unaffected by the choice. Caveat: 'argmax'
    and 'pallas' are reverse-mode only (jax.custom_vjp blocks
    jvp/jacfwd); use 'native' for any forward-mode autodiff tooling.

    On TPU, 'pallas' silently (one warning per process) falls back to
    'native' for shapes outside the kernel's validated envelope
    (:func:`pallas_pool_envelope_ok`) instead of risking a Mosaic
    compile error deep inside a train step.
    """
    if impl == "argmax":
        return max_pool_argmax_grad(x, STEM_POOL["window_shape"],
                                    STEM_POOL["strides"],
                                    STEM_POOL["padding"])
    if impl == "pallas":
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and not pallas_pool_envelope_ok(x.shape):
            import warnings
            warnings.warn(
                f"pool_grad='pallas': shape {tuple(x.shape)} is outside "
                "the validated Mosaic envelope (H even, W % 4 == 0, "
                "C >= 64); falling back to the native select-and-scatter "
                "gradient for this call", stacklevel=2)
            impl = "native"
        else:
            return max_pool_pallas_grad(x, not on_tpu)
    if impl == "native":
        return nn.max_pool(x, STEM_POOL["window_shape"],
                           strides=STEM_POOL["strides"],
                           padding=STEM_POOL["padding"])
    raise ValueError(
        f"pool_grad {impl!r} not in ('argmax', 'native', 'pallas')")
