"""max_pool_argmax_grad: forward identity + gradient-routing equality.

The custom VJP replaces the select-and-scatter pool gradient in the
ResNet stems (nn/resnet.py). These tests pin that it is a drop-in:
identical forward values (it IS the same reduce_window program), and
gradients whose tie ROUTING (which element receives gradient -- first
max in row-major window order) matches both flax/XLA and torch
MaxPool2d exactly, with values equal up to fp-addition reassociation
across overlapping windows (the same ulp band that separates torch
from XLA's own select-and-scatter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from handpose_tpu.ops.pooling import STEM_POOL as W332
from handpose_tpu.ops.pooling import max_pool_argmax_grad


def _pool_ref(x):
    return nn.max_pool(x, W332["window_shape"], strides=W332["strides"],
                       padding=W332["padding"])


def _pool_new(x):
    return max_pool_argmax_grad(x, W332["window_shape"], W332["strides"],
                                W332["padding"])


def _assert_same_routing(want, got, tol=1e-6):
    """Identical tie routing (support set), values to reassociation ulps.

    An input element covered by several overlapping windows accumulates
    its contributions in implementation-defined order, so any two correct
    implementations (torch, XLA select-and-scatter, ours) agree only to
    fp-addition reassociation -- but which elements receive ANY gradient
    is order-independent and must match exactly, with ONE carve-out: in
    bf16, torch/XLA accumulate the scattered contributions in bf16,
    where several contributions can cancel/round to EXACTLY 0.0, while
    the pallas kernel sums them in f32 and rounds once (strictly more
    accurate).  Verified on such a case that the per-window first-max
    routing is still identical (brute-force argmax agreed with the
    kernel at every position; the reference's bf16 accumulator was the
    only difference).  So under a loose ``tol`` (bf16), support may
    differ only where BOTH sides are at cancellation scale (<= atol).
    """
    want = np.asarray(want, np.float32)
    got = np.asarray(got, np.float32)
    atol = tol * max(1.0, np.abs(want).max())
    support_mismatch = (want != 0.0) != (got != 0.0)
    small = (np.abs(want) <= atol) & (np.abs(got) <= atol)
    bad = support_mismatch & ~small
    assert not bad.any(), (
        f"{bad.sum()} routing mismatches beyond accumulation scale at "
        f"{np.argwhere(bad)[:5]}")
    np.testing.assert_allclose(got, want, rtol=tol, atol=atol)


def _cases(dtype):
    rng = np.random.default_rng(0)
    smooth = rng.normal(size=(2, 17, 13, 5)).astype(dtype)
    # tie-heavy: few quantization levels + post-relu-style zeros
    tie = np.maximum(
        rng.integers(-2, 3, size=(3, 16, 16, 4)).astype(dtype), 0.0)
    stemlike = np.maximum(
        rng.normal(size=(2, 32, 32, 8)), 0.0).astype(dtype)
    return {"smooth": smooth, "ties": tie, "stemlike": stemlike}


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
@pytest.mark.parametrize("case", ["smooth", "ties", "stemlike"])
def test_forward_identical(dtype, case):
    x = jnp.asarray(_cases(np.float32)[case], dtype)
    a = jax.jit(_pool_ref)(x)
    b = jax.jit(_pool_new)(x)
    assert a.dtype == b.dtype and a.shape == b.shape
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
@pytest.mark.parametrize("case", ["smooth", "ties", "stemlike"])
def test_gradient_same_routing(dtype, case):
    x = jnp.asarray(_cases(np.float32)[case], dtype)
    # non-uniform cotangent so routing errors can't cancel
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=_pool_ref(x).shape).astype(np.float32), dtype)

    def loss(pool, v):
        return jnp.sum(pool(v) * w).astype(jnp.float32)

    g_ref = jax.jit(jax.grad(lambda v: loss(_pool_ref, v)))(x)
    g_new = jax.jit(jax.grad(lambda v: loss(_pool_new, v)))(x)
    assert g_ref.dtype == g_new.dtype
    _assert_same_routing(g_ref, g_new,
                         tol=1e-6 if dtype == np.float32 else 1e-2)


def test_gradient_matches_torch_maxpool():
    """Tie routing == torch MaxPool2d backward (first max, row-major)."""
    torch = pytest.importorskip("torch")
    x = _cases(np.float32)["ties"]
    g = np.random.default_rng(2).normal(
        size=(3, 8, 8, 4)).astype(np.float32)

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
    yt = torch.nn.functional.max_pool2d(xt, 3, stride=2, padding=1)
    yt.backward(torch.tensor(np.transpose(g, (0, 3, 1, 2))))
    want = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))

    _, vjp = jax.vjp(_pool_new, jnp.asarray(x))
    got = np.asarray(vjp(jnp.asarray(g))[0])
    _assert_same_routing(want, got)


def test_odd_sizes_and_vmap_under_jit():
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(4, 2, 15, 11, 3)).astype(np.float32))

    def f(v):
        return jnp.sum(_pool_new(v) ** 2)

    def f_ref(v):
        return jnp.sum(_pool_ref(v) ** 2)

    got = jax.jit(jax.vmap(jax.grad(f)))(x)
    want = jax.jit(jax.vmap(jax.grad(f_ref)))(x)
    _assert_same_routing(want, got)


# ---------------------------------------------------------------------------
# 'pallas' gradient (ops/pallas_kernels.py::max_pool_3x3s2p1_bwd_pallas):
# same first-max routing as 'argmax'/torch, computed in one VMEM pass.
# Interpret mode off-TPU (stem_max_pool auto-selects); the on-chip A/B
# (tools/bench_pool_grad.py --values native,pallas) decides the speed.

from handpose_tpu.ops.pooling import stem_max_pool


def _pool_pallas(x):
    return stem_max_pool(x, "pallas")


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
@pytest.mark.parametrize("case", ["ties", "stemlike"])
def test_pallas_forward_identical(dtype, case):
    x = jnp.asarray(_cases(np.float32)[case], dtype)
    if x.shape[1] % 2 or x.shape[2] % 4:
        pytest.skip("pallas path requires H even / W % 4 == 0")
    a = jax.jit(_pool_ref)(x)
    b = jax.jit(_pool_pallas)(x)
    assert a.dtype == b.dtype and a.shape == b.shape
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
@pytest.mark.parametrize("case", ["ties", "stemlike"])
def test_pallas_gradient_same_routing(dtype, case):
    x = jnp.asarray(_cases(np.float32)[case], dtype)
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=_pool_ref(x).shape).astype(np.float32), dtype)

    def loss(pool, v):
        return jnp.sum(pool(v) * w).astype(jnp.float32)

    g_ref = jax.jit(jax.grad(lambda v: loss(_pool_ref, v)))(x)
    g_new = jax.jit(jax.grad(lambda v: loss(_pool_pallas, v)))(x)
    assert g_ref.dtype == g_new.dtype
    _assert_same_routing(g_ref, g_new,
                         tol=1e-6 if dtype == np.float32 else 1e-2)


def test_pallas_gradient_matches_torch_maxpool():
    torch = pytest.importorskip("torch")
    x = _cases(np.float32)["ties"]
    g = np.random.default_rng(2).normal(
        size=(3, 8, 8, 4)).astype(np.float32)

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
    yt = torch.nn.functional.max_pool2d(xt, 3, stride=2, padding=1)
    yt.backward(torch.tensor(np.transpose(g, (0, 3, 1, 2))))
    want = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))

    _, vjp = jax.vjp(_pool_pallas, jnp.asarray(x))
    got = np.asarray(vjp(jnp.asarray(g))[0])
    _assert_same_routing(want, got)


def test_pallas_bf16_gradient_mass_conserved_eager():
    """Every dy element is placed exactly once -- EAGERLY, in bf16.

    Pins the sentinel fix: a pad value of -3.4e38 rounds to -inf in
    bf16, and 0 * (-inf) = NaN then silently drops window (0,0)'s
    gradient.  Under jit XLA's constant simplification can hide the
    NaN, so this check deliberately runs the raw kernel eagerly
    (interpret mode) where no such folding applies.
    """
    from handpose_tpu.ops.pallas_kernels import max_pool_3x3s2p1_bwd_pallas

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32),
                    jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32),
                     jnp.bfloat16)
    with jax.disable_jit():
        dx = max_pool_3x3s2p1_bwd_pallas(x, dy, interpret=True)
    dx32 = np.asarray(dx, np.float32)
    assert np.isfinite(dx32).all()
    # routing == native select-and-scatter, eager as well
    _, vjp = jax.vjp(_pool_ref, x)
    want = np.asarray(vjp(dy)[0], np.float32)
    _assert_same_routing(want, dx32, tol=1e-2)
    # total mass: each dy lands exactly once.  dx is rounded to bf16
    # per element after f32 accumulation of multi-window terms, so the
    # sums agree only to ~1% -- but the pre-fix NaN blend dropped an
    # entire window's placements (~6% of mass, ADVICE r4), far outside
    np.testing.assert_allclose(dx32.sum(), np.asarray(dy, np.float32).sum(),
                               rtol=2e-2, atol=2e-2)


def test_pallas_off_envelope_falls_back_to_native(monkeypatch):
    """On TPU, an off-envelope shape (here C=8 -- the known Mosaic i1
    relayout corner) under pool_grad='pallas' must produce the native
    gradient via fallback, not a Mosaic compile error."""
    import handpose_tpu.ops.pooling as pooling

    monkeypatch.setattr(pooling.jax, "default_backend", lambda: "tpu")
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 16, 16, 8)).astype(np.float32))
    dy = jnp.asarray(np.random.default_rng(8).normal(
        size=(2, 8, 8, 8)).astype(np.float32))
    with pytest.warns(UserWarning, match="outside the validated"):
        y, vjp = jax.vjp(lambda v: pooling.stem_max_pool(v, "pallas"), x)
    got = vjp(dy)[0]
    _, vjp_ref = jax.vjp(_pool_ref, x)
    want = vjp_ref(dy)[0]
    np.testing.assert_array_equal(np.asarray(y),
                                  np.asarray(_pool_ref(x)))
    _assert_same_routing(want, got)


def test_pallas_envelope_predicate():
    from handpose_tpu.ops.pooling import pallas_pool_envelope_ok

    assert pallas_pool_envelope_ok((32, 128, 128, 64))
    assert not pallas_pool_envelope_ok((2, 16, 16, 8))     # C too small
    assert not pallas_pool_envelope_ok((2, 15, 16, 64))    # H odd
    assert not pallas_pool_envelope_ok((2, 16, 18, 64))    # W % 4 != 0
    assert not pallas_pool_envelope_ok((16, 16, 64))       # not NHWC


def test_pallas_stem_shape_uneven_chunking():
    """H//2 not divisible by the 16-row chunk: the tail chunk absorbs
    the remainder (kernel's last-chunk e=Ho branch)."""
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(2, 36, 24, 5)).astype(np.float32))
    dy = jnp.asarray(np.random.default_rng(5).normal(
        size=(2, 18, 12, 5)).astype(np.float32))
    _, vjp = jax.vjp(_pool_ref, x)
    want = vjp(dy)[0]
    _, vjp2 = jax.vjp(_pool_pallas, x)
    got = vjp2(dy)[0]
    _assert_same_routing(want, got)
