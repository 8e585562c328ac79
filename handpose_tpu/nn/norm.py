"""BatchNorm variance modes.

The torch reference's BatchNorm computes batch variance with a numerically
stable pass (reference backbones via torchvision BN).  Flax's default
one-pass ``E[x^2] - E[x]^2`` is faster (one HBM read of x instead of two)
but cancels catastrophically when ``|mean| >> std`` — measured in round 2
as train-mode outputs that DEPEND on the device partitioning (2% loss
drift sharded-vs-single).  **The framework default is the one-pass 'fast'
form** (config.py ``bn_variance="fast"``, +11.1% train step on v5e):
twin-training parity vs the executed torch reference re-measured under
'fast' sits inside the loop's own seed-chaos band (0.35% vs a 0.39%
3-seed shadow-ensemble band, docs/TWIN_PARITY.json), i.e. the
cancellation regime does not arise in these nets — He-initialised conv
outputs are near zero-mean.  'stable' (two-pass, partition-invariant)
stays one flag away for extreme activation scales or when bitwise
partition-invariance matters; tests/test_norm.py pins both regimes.

``ShiftedBatchNorm`` is the third point on that trade-off: a one-pass
variance CENTRED ON THE RUNNING MEAN,

    d   = x - running_mean
    mu  = running_mean + E[d]
    var = E[d^2] - E[d]^2

which is mathematically identical to the batch variance (shift identity)
and reads x once, like the fast form — but the cancellation term
``E[d]^2`` is O((batch_mean - running_mean)^2), which collapses toward 0
as the running mean tracks the data (momentum 0.9 ≈ a few dozen steps),
instead of O(mean^2) like the fast form.  At initialisation
(running_mean = 0) it degrades exactly to the fast form; He-initialised
conv outputs are near zero-mean there, so the bad regime
(|mean| >> std with a cold shift) does not arise in these nets.

Parameter/variable names mirror ``flax.linen.BatchNorm`` ("scale"/"bias",
batch_stats "mean"/"var"), so checkpoints and weight transfer are
interchangeable across modes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes

BN_MODES = ("stable", "fast", "shifted")


class ShiftedBatchNorm(nn.Module):
    """BatchNorm with running-mean-shifted one-pass batch variance.

    ``moments``: 'auto'/'jnp' use the XLA reduction form; 'pallas' routes
    the moment computation through the one-HBM-pass dual-moment kernel
    (ops/pallas_kernels.py::fused_shifted_moments).  The kernel is a
    MEASURED NEGATIVE on v5e and therefore opt-in: in isolation it runs
    ~4x slower than XLA's reduction (tools/micro_moments.py: 0.86 ms vs
    0.18 ms net of dispatch on the quarter-stem shape, where XLA already
    hits ~745 GB/s i.e. the HBM roofline -- the two sibling reductions
    DO multi-output-fuse into one pass in isolation), and in the full
    fused train step the pallas_call fusion barrier + unfused custom-VJP
    backward cost 22% of throughput (tools/ab_train_step.py: 2331 vs
    2979 img/s).  The round-3 'shifted'-mode deficit vs 'fast' is a
    fusion-context effect, not the moment pass itself."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros
    moments: str = "auto"

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        reduction_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))
        scale = self.param("scale", self.scale_init, (C,),
                           self.param_dtype)
        bias = self.param("bias", self.bias_init, (C,),
                          self.param_dtype)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = 1.0
            for ax in reduction_axes:
                n *= x.shape[ax]
            use_pallas = self.moments == "pallas"
            if use_pallas:
                from ..ops.pallas_kernels import fused_shifted_moments
                s, ss = fused_shifted_moments(
                    x.reshape(-1, C), ra_mean.value,
                    jax.default_backend() != "tpu")   # interpret off-TPU
                mu_s = s / n
                var = jnp.maximum(ss / n - mu_s * mu_s, 0.0)
            else:
                xf = x.astype(jnp.promote_types(jnp.float32, x.dtype))
                d = xf - ra_mean.value
                mu_s = jnp.mean(d, axis=reduction_axes)
                # one fused pass over x: both reductions read the same d
                var = jnp.maximum(
                    jnp.mean(d * d, axis=reduction_axes) - mu_s * mu_s, 0.0)
            mean = ra_mean.value + mu_s
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        y = x - mean.reshape((1,) * (x.ndim - 1) + (-1,))
        mul = scale.reshape((1,) * (x.ndim - 1) + (-1,)) * \
            jax.lax.rsqrt(var.reshape((1,) * (x.ndim - 1) + (-1,)) +
                          self.epsilon)
        args = dtypes.promote_dtype(y, mul,
                                    bias.reshape((1,) * (x.ndim - 1) + (-1,)),
                                    dtype=self.dtype)
        y, mul, b = args
        return y * mul + b


def make_norm(bn_variance: str, train: bool, dtype):
    """The norm-layer factory shared by every backbone/head.

    'fast'    -> flax BatchNorm, one-pass E[x^2]-E[x]^2 (the default;
                 +11.1% train step on v5e, partition-DEPENDENT when
                 |mean| >> std -- a regime these nets don't enter,
                 see module docstring)
    'stable'  -> flax BatchNorm, two-pass variance (torch semantics,
                 partition-invariant)
    'shifted' -> ShiftedBatchNorm (one-pass speed, running-mean shift
                 keeps the cancellation benign)
    """
    if bn_variance not in BN_MODES:
        raise ValueError(f"bn_variance {bn_variance!r} not in {BN_MODES}")
    if bn_variance == "shifted":
        return partial(ShiftedBatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=dtype)
    return partial(nn.BatchNorm, use_running_average=not train,
                   momentum=0.9, epsilon=1e-5, dtype=dtype,
                   use_fast_variance=bn_variance == "fast")
