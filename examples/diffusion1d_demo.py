#!/usr/bin/env python
"""Standalone conditional 1-D diffusion demo (reference example/ analogue).

TPU-native counterpart of reference
example/GaussianDiffusion1DExample.py:16-114: trains a small conditional
Unet1D to denoise synthetic 1-D signals whose shape depends on a condition
vector, then samples with DDPM and DDIM and reports reconstruction error.

Runs in ~a minute on CPU:  python examples/diffusion1d_demo.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from handpose_tpu.nn.diffusion import DiffusionJointEstimation


def synth_batch(rng, batch, seq_len=63, cond_dim=16):
    """Signals: mixture of two sinusoids whose frequencies are encoded in
    the condition vector."""
    k1, k2 = jax.random.split(rng)
    freq = jax.random.uniform(k1, (batch, 2), minval=1.0, maxval=4.0)
    phase = jax.random.uniform(k2, (batch, 2), minval=0, maxval=2 * np.pi)
    t = jnp.linspace(0, 1, seq_len)[None, :]
    x = 0.5 * (jnp.sin(2 * np.pi * freq[:, :1] * t + phase[:, :1]) +
               jnp.sin(2 * np.pi * freq[:, 1:] * t + phase[:, 1:]))
    x01 = (x + 1) / 2                              # diffusion works in [0,1]
    cond = jnp.concatenate([freq, phase,
                            jnp.zeros((batch, cond_dim - 4))], axis=1)
    return x01[:, None, :], cond                   # (B, 1, L), (B, C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--timesteps", type=int, default=100)
    args = ap.parse_args()

    cond_dim = 16
    model = DiffusionJointEstimation(condition_feat_dim=cond_dim,
                                     num_timesteps=args.timesteps,
                                     num_sampling_timesteps=args.timesteps // 2,
                                     dim=32)
    rng = jax.random.PRNGKey(0)
    x0, cond = synth_batch(rng, args.batch)
    params = model.init(rng, x0, cond, rng)
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        d_rng, n_rng = jax.random.split(rng)
        x0, cond = synth_batch(d_rng, args.batch)

        def loss_fn(p):
            return model.apply(p, x0, cond, n_rng)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        rng, srng = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, srng)
        if i % 50 == 0:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    # sample conditioned on held-out conditions, compare to ground truth
    rng, d_rng, s_rng = jax.random.split(rng, 3)
    x_true, cond = synth_batch(d_rng, 8)
    x_samp = model.apply(params, cond, s_rng, method=model.sample)
    err = float(jnp.mean(jnp.abs(x_samp - x_true)))
    print(f"mean |sample - truth| after {args.steps} steps: {err:.4f} "
          f"(untrained baseline ~0.35)")


if __name__ == "__main__":
    main()
