"""Flax ResNet backbones (NHWC, bf16-friendly).

TPU-native equivalents of the reference's torchvision-based extractors:

* :class:`ResNet`             -- resnet18/50 trunk with the reference's
  conv1 swap (k=3, s=2, arbitrary input channels; reference
  resNetFeatureExtractor.py:10-26, PoseViewPointNetwork.py:18-33,
  resnet50MANO.py:20-35) and a 1000-d fc head like torchvision.
* :class:`ResNetFeatureExtractor` -- trunk + projection fc to ``feat_dim``
  (reference resNetFeatureExtractor.py:10-26).
* :class:`ResNetMano`         -- the boukhayma-style hand-rolled BasicBlock
  [3,4,6,3] net with dual conv1 (3ch / 24ch, 7x7 s2) and an fc to the MANO
  parameter vector (reference resnetMANO.py:138-235).

Divergences (documented):
* no pretrained ImageNet weights are loaded (torchvision is unavailable and
  the environment has no egress); conv1 was retrained from scratch in the
  reference anyway.  He-normal init mirrors torch's default for convs.
* ResNetMano reproduces ``AvgPool2d(7)`` exactly for feature maps >= 7x7
  (stride-7 pooling of an 8x8/10x10 map keeps only the top-left 7x7
  window); for maps smaller than 7 (inputs < 224px, where torch's
  AvgPool2d(7) raises) it falls back to a global mean.

Layout: NHWC with channels-last convolutions -- the native layout for TPU
MXU convolutions.  ``dtype`` controls the compute dtype (bfloat16 on TPU);
parameters and batch-norm statistics stay float32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pooling import stem_max_pool
from .norm import make_norm

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides,
                      padding=((1, 1), (1, 1)))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=((1, 1), (1, 1)))(y)
        y = self.norm(scale_init=nn.initializers.ones)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides,
                                 padding="VALID", name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), self.strides,
                      padding=((1, 1), (1, 1)))(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.ones)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1), self.strides,
                                 padding="VALID", name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C); channel order (bh, bw, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // block, W // block, block * block * C)


def stem_kernel_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Exactly re-express a k3 s2 p1 conv kernel for a space-to-depth input.

    conv(x, w, k=3, s=2, p=1) == conv(s2d(x, 2), w', k=2, s=1, p=(1,0))
    where each original tap (ky, kx) of ``w`` (3, 3, C, F) lands in w'
    (2, 2, 4C, F) at block position ((ky+1)//2, (kx+1)//2) and channel
    slot ((ky+1)%2, (kx+1)%2): output pixel (i, j) reads original rows
    2i-1..2i+1 == s2d cells (i-1, i) at intra-cell rows (1, 0, 1).
    """
    k, _, C, F = w.shape
    assert k == 3
    wp = jnp.zeros((2, 2, 4 * C, F), w.dtype)
    for ky in range(3):
        cell_y, in_y = (ky + 1) // 2, (ky + 1) % 2
        for kx in range(3):
            cell_x, in_x = (kx + 1) // 2, (kx + 1) % 2
            slot = (in_y * 2 + in_x) * C
            wp = wp.at[cell_y, cell_x, slot:slot + C, :].set(w[ky, kx])
    return wp


class _StemConvS2D(nn.Module):
    """k3 s2 p1 stem conv computed on a space-to-depth input.

    Parameter path/shape is identical to the plain stem (``kernel`` of
    (3, 3, C, F)), so checkpoints and the torch converter are
    stem-agnostic; the (2, 2, 4C, F) re-expression happens at trace time
    and XLA constant-folds it into the weights.
    """

    filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.filters), jnp.float32)
        wp = stem_kernel_to_s2d(w).astype(self.dtype)
        xs = space_to_depth(x, 2).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            xs, wp, window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet(nn.Module):
    """ResNet trunk + 1000-d fc (torchvision-compatible shape contract).

    ``stem`` selects between the reference's replaced conv1 (k=3, s=2;
    'k3s2'), the classic 7x7 s2 stem ('k7s2'), and a space-to-depth
    variant of the k3s2 stem ('k3s2_s2d') that computes the SAME function
    (see :func:`stem_kernel_to_s2d`) but feeds the MXU a 4x-wider
    contraction (e.g. 84 instead of 21 input channels) -- the standard
    TPU ResNet stem optimisation.  Its parameters keep the (3, 3, C, F)
    layout so checkpoints/converters are stem-agnostic; the re-expression
    happens at trace time (XLA folds it into the weights).
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_classes: int = 1000
    num_filters: int = 64
    stem: str = "k3s2"
    dtype: jnp.dtype = jnp.float32
    # batch-variance mode (see nn/norm.py): 'stable' = two-pass (torch
    # semantics, partition-invariant; default), 'fast' = flax one-pass
    # E[x^2]-E[x]^2 (7.6% faster train step, cancels catastrophically
    # when |mean| >> std -- measured 2% partition-dependent loss drift),
    # 'shifted' = one-pass centred on the running mean (fast-path speed,
    # benign cancellation once the running mean warms up).
    bn_variance: str = "stable"
    pool_grad: str = "native"   # see ops/pooling.py (mirrors Config.pool_grad)

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.he_normal())
        norm = make_norm(self.bn_variance, train, self.dtype)

        if self.stem == "k3s2":
            x = conv(self.num_filters, (3, 3), (2, 2),
                     padding=((1, 1), (1, 1)), name="conv_init")(x)
        elif self.stem == "k3s2_s2d":
            x = _StemConvS2D(self.num_filters, dtype=self.dtype,
                             name="conv_init")(x)
        elif self.stem == "k7s2":
            x = conv(self.num_filters, (7, 7), (2, 2),
                     padding=((3, 3), (3, 3)), name="conv_init")(x)
        else:
            raise ValueError(self.stem)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        x = stem_max_pool(x, self.pool_grad)
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block_cls(self.num_filters * 2 ** i, strides=strides,
                                   conv=conv, norm=norm)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = x.astype(jnp.float32)
        if self.num_classes:
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         name="fc")(x).astype(jnp.float32)
        return x


ResNet18 = partial(ResNet, stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock)
ResNet34 = partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=BasicBlock)
ResNet50 = partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=BottleneckBlock)


class ResNetFeatureExtractor(nn.Module):
    """ResNet-50 trunk (modified conv1) + fc projection to ``feat_dim``.

    Reference resNetFeatureExtractor.py:10-26.
    """

    feat_dim: int
    dtype: jnp.dtype = jnp.float32
    stem: str = "k3s2"
    bn_variance: str = "stable"
    pool_grad: str = "native"   # see ops/pooling.py (mirrors Config.pool_grad)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNet50(dtype=self.dtype, stem=self.stem,
                     bn_variance=self.bn_variance,
                     pool_grad=self.pool_grad,
                     name="trunk")(x, train=train)
        return nn.Dense(self.feat_dim, name="fc_proj")(x)


class ExtendedResNet18(nn.Module):
    """ResNet-18 trunk with modified conv1, 1000-d output.

    Reference PoseViewPointNetwork.py:18-33.
    """

    dtype: jnp.dtype = jnp.float32
    stem: str = "k3s2"
    bn_variance: str = "stable"
    pool_grad: str = "native"   # see ops/pooling.py (mirrors Config.pool_grad)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResNet18(dtype=self.dtype, stem=self.stem,
                        bn_variance=self.bn_variance,
                        pool_grad=self.pool_grad,
                        name="trunk")(x, train=train)


class ExtendedResNet50(nn.Module):
    """ResNet-50 trunk with modified conv1, 1000-d output.

    Reference resnet50MANO.py:15-24.
    """

    dtype: jnp.dtype = jnp.float32
    stem: str = "k3s2"
    bn_variance: str = "stable"
    pool_grad: str = "native"   # see ops/pooling.py (mirrors Config.pool_grad)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResNet50(dtype=self.dtype, stem=self.stem,
                        bn_variance=self.bn_variance,
                        pool_grad=self.pool_grad,
                        name="trunk")(x, train=train)


class ResNetMano(nn.Module):
    """boukhayma-style trunk: BasicBlock [3,4,6,3], dual stem, MANO fc.

    Reference resnetMANO.py:138-235.  ``input_channel`` selects the 3-ch or
    24-ch stem at construction; both stems exist as parameters (as in the
    reference, which always constructs conv1 and conv11).
    """

    fc_dim: int
    input_channel: int = 3   # 3 | 24
    dtype: jnp.dtype = jnp.float32
    bn_variance: str = "stable"   # see ResNet.bn_variance
    pool_grad: str = "native"   # see ops/pooling.py (mirrors Config.pool_grad)

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.he_normal())
        norm = make_norm(self.bn_variance, train, self.dtype)
        if self.input_channel == 24:
            x = conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                     name="conv11")(x)
        elif self.input_channel == 3:
            x = conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                     name="conv1")(x[..., 0:3])
        else:
            raise ValueError("input_channel should be 3 or 24")
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = stem_max_pool(x, self.pool_grad)
        for i, block_count in enumerate([3, 4, 6, 3]):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = BasicBlock(64 * 2 ** i, strides=strides, conv=conv,
                               norm=norm)(x)
        # Reference avgpool is AvgPool2d(7) (resnetMANO.py:158): stride-7
        # pooling emits a single output that averages only the top-left 7x7
        # window of the final map (8x8 for 256px inputs).  Reproduce that
        # exactly; for maps < 7 (where torch would raise) use the full map.
        win = min(7, x.shape[1], x.shape[2])
        x = jnp.mean(x[:, :win, :win, :], axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.fc_dim, name="fc")(x)
