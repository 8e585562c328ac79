"""Geometric-decay MLP factory.

TPU-native port of reference utils/util.py:3-35 (``build_sequtial``): hidden
width shrinks by ``divide`` per layer while it stays >= output_dim, then a
final projection (+ optional sigmoid).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def decay_dims(input_dim: int, output_dim: int, divide: int) -> Sequence[int]:
    dims = []
    d = input_dim
    while d // divide >= output_dim:
        d //= divide
        dims.append(d)
    return dims


class DecayMLP(nn.Module):
    """Linear stack with geometric width decay (reference utils/util.py:3-35)."""

    input_dim: int
    output_dim: int
    divide: int = 4
    activation: str = "ReLU"   # 'ReLU' | 'LeakyReLU' | 'Tanh'
    use_sigmoid: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.activation == "ReLU":
            act = nn.relu
        elif self.activation == "LeakyReLU":
            act = lambda v: nn.leaky_relu(v, negative_slope=0.01)
        elif self.activation == "Tanh":
            act = nn.tanh
        else:
            raise ValueError("activation should be ReLU, LeakyReLU or Tanh")
        for d in decay_dims(self.input_dim, self.output_dim, self.divide):
            x = nn.Dense(d, dtype=self.dtype)(x)
            x = act(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype)(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x
