"""2-D image denoising diffusion (Unet2D + generic GaussianDiffusion).

Counterpart of the reference's image-DDPM dev example
(reference example/diffusionExample.py:189-573, a CIFAR10 DDPM with a torch
Unet).  The schedule/objective/sampling machinery is shared with the 1-D
stack -- :class:`GaussianDiffusion` generalises
:class:`handpose_tpu.nn.diffusion.GaussianDiffusion1D` to arbitrary data
shapes (its math is already ndim-agnostic).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .diffusion import (Attention, GaussianDiffusion1D, RMSNorm,
                        SinusoidalPosEmb)


class GaussianDiffusion(GaussianDiffusion1D):
    """Schedule + samplers for arbitrary data shapes (images etc.)."""

    def __init__(self, data_shape: Tuple[int, ...], **kw):
        super().__init__(seq_length=1, channels=1, **kw)
        self.data_shape = tuple(data_shape)

    def sample(self, denoise_fn, batch_size, condition, rng,
               clip_denoised=True):
        shape = (batch_size,) + self.data_shape
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(denoise_fn, shape, condition, rng, clip_denoised)


class Block2D(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3, 3), padding=[(1, 1), (1, 1)],
                    name="proj")(x)
        # epsilon: torch nn.GroupNorm default is 1e-5 (flax's is 1e-6)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock2D(nn.Module):
    dim: int
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, t=None):
        scale_shift = None
        if t is not None:
            h = nn.Dense(self.dim_out * 2, name="time_proj")(nn.silu(t))
            scale_shift = jnp.split(h[:, None, None, :], 2, axis=-1)
        h = Block2D(self.dim_out, self.groups, name="block1")(x, scale_shift)
        h = Block2D(self.dim_out, self.groups, name="block2")(h)
        res = x if self.dim == self.dim_out else nn.Conv(
            self.dim_out, (1, 1), name="res_conv")(x)
        return h + res


class Unet2D(nn.Module):
    """Compact image UNet denoiser; (B, H, W, C) layout."""

    dim: int = 32
    dim_mults: Sequence[int] = (1, 2, 4)
    channels: int = 3
    condition_feat_dim: int | None = None
    groups: int = 8

    @nn.compact
    def __call__(self, x, time, condition=None):
        block = partial(ResnetBlock2D, groups=self.groups)
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 4

        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    name="init_conv")(x)
        r = x
        t = SinusoidalPosEmb(self.dim)(time)
        t = nn.Dense(time_dim, name="time_mlp_1")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, name="time_mlp_2")(t)
        if condition is not None:
            c = nn.Dense(time_dim, name="cond_mlp_1")(condition)
            c = nn.gelu(c, approximate=False)
            c = nn.Dense(time_dim, name="cond_mlp_2")(c)
            t = t + c

        h = []
        for i, (d_in, d_out) in enumerate(in_out):
            last = i == len(in_out) - 1
            x = block(d_in, d_in, name=f"down_{i}_block")(x, t)
            h.append(x)
            if not last:
                x = nn.Conv(d_out, (4, 4), strides=(2, 2),
                            padding=[(1, 1), (1, 1)],
                            name=f"down_{i}_downsample")(x)
            else:
                x = nn.Conv(d_out, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"down_{i}_conv")(x)

        mid = dims[-1]
        x = block(mid, mid, name="mid_block1")(x, t)
        flat = x.reshape(x.shape[0], -1, mid)
        normed = RMSNorm(mid, name="mid_norm")(flat)
        x = x + Attention(mid, name="mid_attn")(normed).reshape(x.shape)
        x = block(mid, mid, name="mid_block2")(x, t)

        for i, (d_in, d_out) in enumerate(reversed(in_out)):
            last = i == len(in_out) - 1
            skip = h.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = block(d_out + d_in, d_out, name=f"up_{i}_block")(x, t)
            if not last:
                B_, H_, W_, _ = x.shape
                x = jax.image.resize(x, (B_, H_ * 2, W_ * 2, x.shape[-1]),
                                     method="nearest")
                x = nn.Conv(d_in, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"up_{i}_upsample_conv")(x)
            else:
                x = nn.Conv(d_in, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"up_{i}_conv")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = block(self.dim * 2, self.dim, name="final_res_block")(x, t)
        return nn.Conv(self.channels, (1, 1), name="final_conv")(x)
