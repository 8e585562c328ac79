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
    is order-independent and must match exactly.
    """
    want = np.asarray(want, np.float32)
    got = np.asarray(got, np.float32)
    np.testing.assert_array_equal(want != 0.0, got != 0.0)
    np.testing.assert_allclose(got, want, rtol=tol,
                               atol=tol * max(1.0, np.abs(want).max()))


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
