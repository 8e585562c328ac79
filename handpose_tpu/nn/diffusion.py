"""Conditional 1-D denoising diffusion (Unet1D + GaussianDiffusion1D).

TPU-native rebuild of reference
network/sub_modules/conditionalDiffusion.py (799 LoC of vendored
lucidrains-style torch) and diffusionJointEstimation.py:

* :class:`Unet1D` -- conv1d ResNet blocks with time embedding, linear +
  full attention, sinusoidal position embedding, and the reference's
  *condition MLP added to the time embedding*
  (conditionalDiffusion.py:332-337, 396-400).  Layout is (B, L, C)
  -- channels-last, the native XLA convolution layout.
* :class:`GaussianDiffusion1D` -- linear/cosine beta schedules,
  pred_noise / pred_x0 / pred_v objectives, SNR loss weighting, q_sample /
  p_losses training, ancestral and DDIM sampling.  Both samplers are
  ``lax.scan`` loops over a static schedule, jitted end-to-end with
  explicit PRNG threading (the torch version is a 200-iteration python
  loop under no_grad, conditionalDiffusion.py:658-709).

Structural divergences (documented):
* no self-conditioning path (the reference constructs it but the hand-pose
  wrapper never enables it);
* RNG is explicit (jax.random keys) instead of torch global state.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _nearest_resize_1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch nn.Upsample(mode='nearest') semantics: idx = floor(i*in/out)."""
    L = x.shape[1]
    idx = (np.arange(out_len) * L // out_len).astype(np.int32)
    return x[:, jnp.asarray(idx), :]


class RMSNorm(nn.Module):
    """x / |x|_2(channel) * g * sqrt(C)  (conditionalDiffusion.py:RMSNorm)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1, 1, self.dim))
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        normed = x / jnp.maximum(norm, 1e-12)
        return normed * g * math.sqrt(self.dim)


class SinusoidalPosEmb(nn.Module):
    dim: int
    theta: float = 10000.0

    def __call__(self, t):
        half = self.dim // 2
        emb = math.log(self.theta) / (half - 1)
        freqs = jnp.exp(jnp.arange(half) * -emb)
        ang = t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class Block(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3,), padding=[(1, 1)], name="proj")(x)
        # epsilon: torch nn.GroupNorm default is 1e-5 (flax's is 1e-6)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    dim: int
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, time_emb=None, time_proj=None):
        """``time_proj`` optionally injects this block's precomputed
        ``Dense(silu(time_emb))`` output (..., 2*dim_out) -- the sampler
        hoists these out of its scan (the projection depends only on the
        step's time embedding, which is static per sampling step).  With
        ``x=None`` the block runs in PRECOMPUTE mode and returns that
        projection for the given (batched-over-steps) embedding."""
        if x is None:
            return nn.Dense(self.dim_out * 2,
                            name="time_proj")(nn.silu(time_emb))
        scale_shift = None
        if time_proj is not None:
            scale_shift = jnp.split(time_proj[..., None, :], 2, axis=-1)
        elif time_emb is not None:
            t = nn.Dense(self.dim_out * 2, name="time_proj")(nn.silu(time_emb))
            t = t[:, None, :]                      # (B, 1, 2*dim_out)
            scale_shift = jnp.split(t, 2, axis=-1)
        h = Block(self.dim_out, self.groups, name="block1")(x, scale_shift)
        h = Block(self.dim_out, self.groups, name="block2")(h)
        res = x if self.dim == self.dim_out else nn.Conv(
            self.dim_out, (1,), name="res_conv")(x)
        return h + res


class LinearAttention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, L, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1,), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):   # (B, L, H*D) -> (B, H, D, L)
            return t.reshape(B, L, self.heads, self.dim_head).transpose(
                0, 2, 3, 1)

        q, k, v = map(split_heads, (q, k, v))
        q = jax.nn.softmax(q, axis=-2)           # over d
        k = jax.nn.softmax(k, axis=-1)           # over n
        q = q * (self.dim_head ** -0.5)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)   # (B, H, E, L)
        out = out.transpose(0, 3, 1, 2).reshape(B, L, hidden)
        out = nn.Conv(self.dim, (1,), name="to_out")(out)
        return RMSNorm(self.dim, name="out_norm")(out)


class Attention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, L, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1,), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):   # (B, L, H*D) -> (B, H, L, D)
            return t.reshape(B, L, self.heads, self.dim_head).transpose(
                0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, hidden)
        return nn.Conv(self.dim, (1,), name="to_out")(out)


class PreNormResidual(nn.Module):
    dim: int
    kind: str = "linear"   # 'linear' | 'full'
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        cls = LinearAttention if self.kind == "linear" else Attention
        attn = cls(self.dim, self.heads, self.dim_head, name="attn")
        return attn(RMSNorm(self.dim, name="norm")(x)) + x


class Unet1D(nn.Module):
    """1-D UNet denoiser; (B, L, C) layout.

    Mirrors reference Unet1D(dim, dim_mults, channels, condition_feat_dim)
    (conditionalDiffusion.py:309-458).
    """

    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 1
    condition_feat_dim: int | None = None
    resnet_block_groups: int = 8
    attn_heads: int = 4
    attn_dim_head: int = 32

    def _block_specs(self, in_out):
        """(name, dim, dim_out) of every time-conditioned ResnetBlock, in
        declaration order -- the precompute pass and the run pass must
        agree on these exactly (same names => same params)."""
        specs = []
        for ind, (dim_in, _) in enumerate(in_out):
            specs += [(f"down_{ind}_block1", dim_in, dim_in),
                      (f"down_{ind}_block2", dim_in, dim_in)]
        mid = in_out[-1][1]
        specs += [("mid_block1", mid, mid), ("mid_block2", mid, mid)]
        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            specs += [(f"up_{ind}_block1", dim_out + dim_in, dim_out),
                      (f"up_{ind}_block2", dim_out + dim_in, dim_out)]
        specs.append(("final_res_block", self.dim * 2, self.dim))
        return specs

    @nn.compact
    def __call__(self, x, time, condition=None, time_tables=None):
        """Denoise ``x`` at ``time``.

        Two extra modes serve the hoisted samplers (the ~600-HLO denoise
        step is per-op-overhead-bound on TPU, NOTES_r3.md):

        * ``x=None`` -- PRECOMPUTE: ``time`` is the (S,) ladder of ALL
          sampling steps; returns ``{block_name: (S, B|1, 2*dim_out)}``
          tables of every block's time projection, batched over steps in
          one pass (each is a plain matmul row per step -- identical math
          to the per-step Dense).
        * ``time_tables={name: (B|1, 2*dim_out)}`` -- a single step's
          slices of those tables; the whole time/condition-embedding MLP
          stack and every per-block time projection are skipped.
        """
        groups = self.resnet_block_groups
        block = partial(ResnetBlock, groups=groups)
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 4

        if x is None or time_tables is None:
            t = SinusoidalPosEmb(self.dim)(time)
            t = nn.Dense(time_dim, name="time_mlp_1")(t)
            t = nn.gelu(t, approximate=False)
            t = nn.Dense(time_dim, name="time_mlp_2")(t)
            if condition is not None:
                c = nn.Dense(time_dim, name="cond_mlp_1")(condition)
                c = nn.gelu(c, approximate=False)
                c = nn.Dense(time_dim, name="cond_mlp_2")(c)
                if x is None:                     # (S,·) + (B,·) -> (S,B,·)
                    t = t[:, None, :] + c[None, :, :]
                else:
                    t = t + c
            elif x is None:
                t = t[:, None, :]                 # (S, 1, time_dim)
        else:
            t = None

        if x is None:
            return {name: block(d, d_out, name=name)(None, t)
                    for name, d, d_out in self._block_specs(in_out)}

        def tp(name):
            return None if time_tables is None else time_tables[name]

        x = nn.Conv(self.dim, (7,), padding=[(3, 3)], name="init_conv")(x)
        r = x

        h = []
        n_res = len(in_out)
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            nm = f"down_{ind}_block1"
            x = block(dim_in, dim_in, name=nm)(x, t, tp(nm))
            h.append(x)
            nm = f"down_{ind}_block2"
            x = block(dim_in, dim_in, name=nm)(x, t, tp(nm))
            x = PreNormResidual(dim_in, "linear", self.attn_heads,
                                self.attn_dim_head,
                                name=f"down_{ind}_attn")(x)
            h.append(x)
            if not is_last:
                x = nn.Conv(dim_out, (4,), strides=(2,), padding=[(1, 1)],
                            name=f"down_{ind}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3,), padding=[(1, 1)],
                            name=f"down_{ind}_conv")(x)

        mid = dims[-1]
        x = block(mid, mid, name="mid_block1")(x, t, tp("mid_block1"))
        x = PreNormResidual(mid, "full", self.attn_heads,
                            self.attn_dim_head, name="mid_attn")(x)
        x = block(mid, mid, name="mid_block2")(x, t, tp("mid_block2"))

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == n_res - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            nm = f"up_{ind}_block1"
            x = block(dim_out + dim_in, dim_out, name=nm)(x, t, tp(nm))
            x = jnp.concatenate([x, h.pop()], axis=-1)
            nm = f"up_{ind}_block2"
            x = block(dim_out + dim_in, dim_out, name=nm)(x, t, tp(nm))
            x = PreNormResidual(dim_out, "linear", self.attn_heads,
                                self.attn_dim_head,
                                name=f"up_{ind}_attn")(x)
            if not is_last:
                # CustomUpsample: nearest x2 (+1 when odd) then conv
                # (conditionalDiffusion.py:98-118)
                L = x.shape[1]
                up = L * 2 + (1 if L % 2 != 0 else 0)
                x = _nearest_resize_1d(x, up)
                x = nn.Conv(dim_in, (3,), padding=[(1, 1)],
                            name=f"up_{ind}_upsample_conv")(x)
            else:
                x = nn.Conv(dim_in, (3,), padding=[(1, 1)],
                            name=f"up_{ind}_conv")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = block(self.dim * 2, self.dim,
                  name="final_res_block")(x, t, tp("final_res_block"))
        return nn.Conv(self.channels, (1,), name="final_conv")(x)


# ---------------------------------------------------------------------------


def ddim_time_pairs(total: int, sampling: int) -> np.ndarray:
    """(S, 2) descending (time, time_next) ladder for DDIM.

    Reproduces the reference's ``torch.linspace(-1, T-1, S+1).int()``
    reversed pairing (conditionalDiffusion.py:678-681).
    """
    times = np.linspace(-1, total - 1, sampling + 1).astype(int)[::-1]
    return np.stack([times[:-1], times[1:]], axis=1)


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, timesteps,
                       dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


class DiffusionSchedule:
    """Precomputed schedule constants (float32 like the reference buffers).

    Stored as HOST numpy arrays: the samplers fold them into static
    per-step coefficients at trace time (a jnp buffer would be an
    omnistaged tracer when a module's setup() runs under jit, and static
    folding needs concrete values).  Traced-index consumers (_extract,
    loss_weight[t]) wrap them in jnp.asarray at the use site."""

    def __init__(self, timesteps: int, beta_schedule: str = "cosine",
                 objective: str = "pred_noise"):
        if beta_schedule == "linear":
            betas = linear_beta_schedule(timesteps)
        elif beta_schedule == "cosine":
            betas = cosine_beta_schedule(timesteps)
        else:
            raise ValueError(f"unknown beta schedule {beta_schedule}")
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        f32 = lambda a: np.asarray(a, np.float32)
        self.betas = f32(betas)
        self.alphas_cumprod = f32(ac)
        self.alphas_cumprod_prev = f32(ac_prev)
        self.sqrt_alphas_cumprod = f32(np.sqrt(ac))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1 - ac))
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1 / ac))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1 / ac - 1))
        pv = betas * (1 - ac_prev) / (1 - ac)
        self.posterior_variance = f32(pv)
        self.posterior_log_variance_clipped = f32(
            np.log(np.maximum(pv, 1e-20)))
        self.posterior_mean_coef1 = f32(betas * np.sqrt(ac_prev) / (1 - ac))
        self.posterior_mean_coef2 = f32(
            (1 - ac_prev) * np.sqrt(alphas) / (1 - ac))
        snr = ac / (1 - ac)
        if objective == "pred_noise":
            lw = np.ones_like(snr)
        elif objective == "pred_x0":
            lw = snr
        elif objective == "pred_v":
            lw = snr / (snr + 1)
        else:
            raise ValueError(f"unknown objective {objective}")
        self.loss_weight = f32(lw)


def _extract(a, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    out = jnp.asarray(a)[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


class GaussianDiffusion1D:
    """Training loss + DDPM/DDIM sampling around a denoiser apply-fn.

    The denoiser is a function ``(x (B,L,C), t (B,), condition) -> (B,L,C)``
    (typically a bound Unet1D apply).  Matches reference
    GaussianDiffusion1D (conditionalDiffusion.py:467-798) with
    ``auto_normalize=True`` ([0,1] <-> [-1,1]).
    """

    def __init__(self, seq_length: int, channels: int = 1,
                 timesteps: int = 1000, sampling_timesteps: int | None = None,
                 objective: str = "pred_noise", beta_schedule: str = "cosine",
                 ddim_sampling_eta: float = 0.0, auto_normalize: bool = True,
                 scan_unroll: int = 1):
        self.seq_length = seq_length
        self.channels = channels
        self.num_timesteps = timesteps
        self.sampling_timesteps = (sampling_timesteps if sampling_timesteps
                                   is not None else timesteps)
        assert self.sampling_timesteps <= timesteps
        self.is_ddim_sampling = self.sampling_timesteps < timesteps
        self.eta = ddim_sampling_eta
        self.objective = objective
        self.sched = DiffusionSchedule(timesteps, beta_schedule, objective)
        self.auto_normalize = auto_normalize
        # sampling-loop unroll factor: the denoise step is ~600 tiny HLOs
        # (on-chip profile, NOTES_r3.md), so per-iteration loop overhead
        # is a real cost; unrolling lets XLA schedule k steps together.
        # Semantics-preserving (same math, program structure only).
        self.scan_unroll = scan_unroll

    # -- value transforms ---------------------------------------------------
    def normalize(self, x):
        return x * 2.0 - 1.0 if self.auto_normalize else x

    def unnormalize(self, x):
        return (x + 1.0) * 0.5 if self.auto_normalize else x

    # -- conversions ---------------------------------------------------------
    def predict_start_from_noise(self, x_t, t, noise):
        s = self.sched
        return (_extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t -
                _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise)

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.sched
        return ((_extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0)
                / _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))

    def predict_v(self, x_start, t, noise):
        s = self.sched
        return (_extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * noise -
                _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
                * x_start)

    def predict_start_from_v(self, x_t, t, v):
        s = self.sched
        return (_extract(s.sqrt_alphas_cumprod, t, x_t.ndim) * x_t -
                _extract(s.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v)

    def model_predictions(self, denoise_fn, x, t, condition,
                          clip_x_start=False):
        out = denoise_fn(x, t, condition)
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (
            lambda v: v)
        if self.objective == "pred_noise":
            pred_noise = out
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
        elif self.objective == "pred_x0":
            x_start = clip(out)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_v":
            x_start = clip(self.predict_start_from_v(x, t, out))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return pred_noise, x_start

    def q_posterior(self, x_start, x_t, t):
        s = self.sched
        mean = (_extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start +
                _extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t)
        logvar = _extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, logvar

    # -- training ------------------------------------------------------------
    def q_sample(self, x_start, t, noise):
        s = self.sched
        return (_extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start +
                _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
                * noise)

    def p_losses(self, denoise_fn, x_start, t, noise, condition):
        x = self.q_sample(x_start, t, noise)
        out = denoise_fn(x, t, condition)
        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        elif self.objective == "pred_v":
            target = self.predict_v(x_start, t, noise)
        loss = jnp.mean((out - target) ** 2,
                        axis=tuple(range(1, out.ndim)))       # (B,)
        loss = loss * jnp.asarray(self.sched.loss_weight)[t]
        return jnp.mean(loss)

    def loss(self, denoise_fn, x0, condition, rng, t=None, noise=None):
        """Training objective; x0 is in data space ([0,1]-ish like the
        reference normalise contract).  (conditionalDiffusion.py:781-798)

        ``t`` / ``noise`` optionally inject the timestep draw and the
        q_sample noise (noise in NORMALISED space, drawn after the
        reference normalises at conditionalDiffusion.py:797) instead of
        drawing from ``rng`` -- the lockstep twin-training parity harness
        feeds both frameworks identical draws through these."""
        B = x0.shape[0]
        t_rng, n_rng = jax.random.split(rng)
        if t is None:
            t = jax.random.randint(t_rng, (B,), 0, self.num_timesteps)
        x0 = self.normalize(x0)
        if noise is None:
            noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
        return self.p_losses(denoise_fn, x0, t, noise, condition)

    # -- sampling ------------------------------------------------------------
    #
    # Both samplers fold every schedule-derived quantity into PER-STEP
    # STATIC coefficients computed in numpy at trace time (the reference
    # recomputes them on-device each of its 200 python-loop iterations,
    # conditionalDiffusion.py:658-709).  The denoise step is ~600 tiny
    # HLOs on TPU (per-op overhead bound, NOTES_r3.md), so every gather /
    # where / sqrt / threefry removed from the scan body is wall-clock.
    # Same float32 arithmetic on the same float32 schedule buffers --
    # numerically the op-for-op computation the in-scan version did.

    def _x_start_coefs(self, time: np.ndarray) -> dict:
        """Static per-step coefficients for model_predictions()' linear
        conversions (the clip nonlinearity stays in the step)."""
        s = self.sched
        g = lambda a: np.asarray(a)[time]          # (S,) float32
        return {"srac": g(s.sqrt_recip_alphas_cumprod),
                "sracm1": g(s.sqrt_recipm1_alphas_cumprod),
                "sac": g(s.sqrt_alphas_cumprod),
                "somac": g(s.sqrt_one_minus_alphas_cumprod)}

    def _predictions_from_coefs(self, cf, img, out, clip_denoised):
        """model_predictions() with the per-t gathers replaced by the
        step's static coefficients; identical formulas."""
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_denoised else (
            lambda v: v)
        if self.objective == "pred_noise":
            x_start = clip(cf["srac"] * img - cf["sracm1"] * out)
            pred_noise = out
        elif self.objective == "pred_x0":
            x_start = clip(out)
            pred_noise = (cf["srac"] * img - x_start) / cf["sracm1"]
        else:                                      # pred_v
            x_start = clip(cf["sac"] * img - cf["somac"] * out)
            pred_noise = (cf["srac"] * img - x_start) / cf["sracm1"]
        return pred_noise, x_start

    def _make_denoise(self, denoise_fn, shape, condition, table_fn, times):
        """Returns (xs_extra, call) where call(img, inp) runs the denoiser
        for one step, via hoisted time tables when table_fn is given."""
        if table_fn is None:
            return {}, lambda img, inp: denoise_fn(
                img, jnp.full((shape[0],), inp["t"], jnp.int32), condition)
        tables = table_fn(jnp.asarray(times, jnp.float32))    # {name: (S,·,·)}
        return {"tab": tables}, lambda img, inp: denoise_fn(
            img, jnp.full((shape[0],), inp["t"], jnp.int32), condition,
            inp["tab"])

    def ddim_sample(self, denoise_fn, shape, condition, rng,
                    clip_denoised=True, init_noise=None, table_fn=None):
        """DDIM sampler as a single lax.scan over the static time pairs
        (conditionalDiffusion.py:674-709).

        ``init_noise`` optionally injects the initial x_T instead of drawing
        it from ``rng`` -- with eta=0 the trajectory is then fully
        deterministic (reproducible serving; torch-parity tests).

        ``table_fn(times (S,)) -> pytree`` optionally precomputes hoisted
        per-step denoiser tables (Unet1D precompute mode); the scan slices
        them per step and passes the slice as the denoiser's 4th argument.
        """
        total, sampling = self.num_timesteps, self.sampling_timesteps
        pairs = ddim_time_pairs(total, sampling)              # (S, 2)
        time, time_next = pairs[:, 0], pairs[:, 1]

        ac = np.asarray(self.sched.alphas_cumprod)            # float32
        alpha = ac[time]
        alpha_next = np.where(time_next < 0, np.float32(1.0),
                              ac[np.maximum(time_next, 0)])
        sigma = np.float32(self.eta) * np.sqrt(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
        c = np.sqrt(np.clip(1 - alpha_next - sigma ** 2, 0.0, None))
        sqan = np.sqrt(alpha_next)
        # final step (time_next < 0): img_next == x_start exactly
        last = time_next < 0
        sqan[last], c[last], sigma[last] = 1.0, 0.0, 0.0
        coefs = dict(self._x_start_coefs(time), sqan=sqan, c=c, sigma=sigma)

        rng, init_rng = jax.random.split(rng)
        img0 = (jax.random.normal(init_rng, shape) if init_noise is None
                else jnp.asarray(init_noise, jnp.float32).reshape(shape))
        use_noise = self.eta != 0.0                # static: eta is python
        xs_extra, call = self._make_denoise(denoise_fn, shape, condition,
                                            table_fn, time)
        xs = {"t": jnp.asarray(time, jnp.int32),
              "cf": {k: jnp.asarray(v, jnp.float32)
                     for k, v in coefs.items()}, **xs_extra}
        if use_noise:
            xs["rng"] = jax.random.split(rng, pairs.shape[0])

        def step(img, inp):
            out = call(img, inp)
            cf = inp["cf"]
            pred_noise, x_start = self._predictions_from_coefs(
                cf, img, out, clip_denoised)
            img_next = x_start * cf["sqan"] + cf["c"] * pred_noise
            if use_noise:
                img_next = img_next + cf["sigma"] * jax.random.normal(
                    inp["rng"], img.shape)
            return img_next, None

        img, _ = jax.lax.scan(step, img0, xs, unroll=self.scan_unroll)
        return self.unnormalize(img)

    def p_sample_loop(self, denoise_fn, shape, condition, rng,
                      clip_denoised=True, init_noise=None, table_fn=None):
        """Ancestral DDPM sampler (conditionalDiffusion.py:643-672)."""
        rng, init_rng = jax.random.split(rng)
        img0 = (jax.random.normal(init_rng, shape) if init_noise is None
                else jnp.asarray(init_noise, jnp.float32).reshape(shape))
        ts = np.arange(self.num_timesteps - 1, -1, -1)

        s = self.sched
        std = np.exp(np.float32(0.5) * np.asarray(
            s.posterior_log_variance_clipped)[ts])
        std[ts == 0] = 0.0                         # final step: mean only
        coefs = dict(self._x_start_coefs(ts),
                     c1=np.asarray(s.posterior_mean_coef1)[ts],
                     c2=np.asarray(s.posterior_mean_coef2)[ts], std=std)

        xs_extra, call = self._make_denoise(denoise_fn, shape, condition,
                                            table_fn, ts)
        xs = {"t": jnp.asarray(ts, jnp.int32),
              "cf": {k: jnp.asarray(v, jnp.float32)
                     for k, v in coefs.items()},
              "rng": jax.random.split(rng, self.num_timesteps), **xs_extra}

        def step(img, inp):
            out = call(img, inp)
            cf = inp["cf"]
            _, x_start = self._predictions_from_coefs(
                cf, img, out, clip_denoised)
            mean = cf["c1"] * x_start + cf["c2"] * img
            noise = jax.random.normal(inp["rng"], img.shape)
            return mean + cf["std"] * noise, None

        img, _ = jax.lax.scan(step, img0, xs, unroll=self.scan_unroll)
        return self.unnormalize(img)

    def sample(self, denoise_fn, batch_size, condition, rng,
               clip_denoised=True, init_noise=None, table_fn=None):
        shape = (batch_size, self.seq_length, self.channels)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(denoise_fn, shape, condition, rng, clip_denoised,
                  init_noise, table_fn)


class DiffusionJointEstimation(nn.Module):
    """Unet1D + GaussianDiffusion1D wired like reference
    diffusionJointEstimation.py:9-42 (dim=64, mults 1/2/4/8, channels=1,
    seq=63, T=400, DDIM 200)."""

    keypoint_num: int = 21
    condition_feat_dim: int = 256
    num_timesteps: int = 400
    num_sampling_timesteps: int = 200
    dim: int = 64
    sampler_unroll: int = 1
    # hoist the time/cond embedding MLPs + every block's time projection
    # out of the sampling scan into (S, B, .) tables ('auto': when the
    # tables stay small -- B <= 32; True/False to force).  Identical math
    # (the projections are batched over steps instead of recomputed per
    # step); equivalence pinned in tests/test_diffusion.py.
    sampler_hoist: bool | str = "auto"

    def setup(self):
        self.unet = Unet1D(dim=self.dim, dim_mults=(1, 2, 4, 8), channels=1,
                           condition_feat_dim=self.condition_feat_dim)
        self.diffusion = GaussianDiffusion1D(
            seq_length=self.keypoint_num * 3, channels=1,
            timesteps=self.num_timesteps,
            sampling_timesteps=self.num_sampling_timesteps,
            scan_unroll=self.sampler_unroll)

    def _denoise(self, x, t, condition):
        return self.unet(x, t, condition)

    def __call__(self, x0, condition, rng, t=None, noise=None):
        """Training loss; x0: (B, 1, 63) like the reference pose_x0.

        ``t`` (B,) int and ``noise`` (B, 1, 63) in the reference's torch
        layout optionally inject the loss's random draws (twin-training
        parity); ``noise`` is in normalised space."""
        x0 = jnp.swapaxes(x0, 1, 2)               # (B, 63, 1) channels-last
        if noise is not None:
            noise = jnp.swapaxes(jnp.asarray(noise), 1, 2)
        return self.diffusion.loss(self._denoise, x0, condition, rng,
                                   t=t, noise=noise)

    def sample(self, condition, rng, init_noise=None):
        """``init_noise``: optional (B, 1, 63) x_T in the reference's torch
        layout; with DDIM eta=0 the sample is then deterministic."""
        B = condition.shape[0]
        if init_noise is not None:
            init_noise = jnp.swapaxes(jnp.asarray(init_noise), 1, 2)
        hoist = (B <= 32 if self.sampler_hoist == "auto"
                 else bool(self.sampler_hoist))
        if hoist:
            table_fn = lambda times: self.unet(None, times, condition)
            denoise = lambda x, t, c, tab: self.unet(x, t, c,
                                                     time_tables=tab)
        else:
            table_fn, denoise = None, self._denoise
        out = self.diffusion.sample(denoise, B, condition, rng,
                                    init_noise=init_noise,
                                    table_fn=table_fn)
        return jnp.swapaxes(out, 1, 2)            # (B, 1, 63)
