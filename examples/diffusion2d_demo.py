#!/usr/bin/env python
"""Standalone image-DDPM demo (reference example/diffusionExample.py analogue).

Trains a small Unet2D on synthetic 16x16 gradient/stripe images and samples
with the ancestral DDPM loop.  The reference's CIFAR10+FID scratchpad is
dev-only code; this demonstrates the same capability (2-D denoising
diffusion with the shared schedule machinery) self-contained.

Run:  python examples/diffusion2d_demo.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from handpose_tpu.nn.diffusion2d import GaussianDiffusion, Unet2D


def synth_images(rng, batch, size=16):
    """Diagonal gradients with random orientation + stripe frequency."""
    k1, k2 = jax.random.split(rng)
    ang = jax.random.uniform(k1, (batch,), minval=0, maxval=np.pi)
    freq = jax.random.uniform(k2, (batch,), minval=1.0, maxval=3.0)
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, size), jnp.linspace(0, 1, size),
                          indexing="ij")
    proj = (xx[None] * jnp.cos(ang)[:, None, None] +
            yy[None] * jnp.sin(ang)[:, None, None])
    img = 0.5 + 0.5 * jnp.sin(2 * np.pi * freq[:, None, None] * proj)
    return jnp.stack([img, 1 - img, img ** 2], axis=-1)     # (B, S, S, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--timesteps", type=int, default=50)
    ap.add_argument("--fid", type=int, default=0, metavar="N",
                    help="after training, sample N images and report the "
                         "Frechet distance to N fresh real images "
                         "(random-conv proxy features; see utils/fid.py "
                         "-- the reference scratchpad's InceptionV3 FID, "
                         "diffusionExample.py:293-370)")
    args = ap.parse_args()

    net = Unet2D(dim=24, dim_mults=(1, 2, 4), channels=3)
    gd = GaussianDiffusion((16, 16, 3), timesteps=args.timesteps)
    rng = jax.random.PRNGKey(0)
    x0 = synth_images(rng, args.batch)
    params = net.init(rng, x0, jnp.zeros((args.batch,), jnp.int32), None)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def denoise(p):
        return lambda x, t, c: net.apply(p, x, t, c)

    @jax.jit
    def step(params, opt_state, rng):
        d_rng, n_rng = jax.random.split(rng)
        x0 = synth_images(d_rng, args.batch)
        loss, grads = jax.value_and_grad(
            lambda p: gd.loss(denoise(p), x0, None, n_rng))(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        rng, srng = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, srng)
        if i % 50 == 0:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    samples = gd.sample(denoise(params), 4, None, rng)
    print("sampled", samples.shape, "range",
          float(samples.min()), float(samples.max()))

    if args.fid:
        from handpose_tpu.utils.fid import fid_score

        n = args.fid
        rng, s_rng, r_rng, n_rng = jax.random.split(rng, 4)
        gen = np.asarray(gd.sample(denoise(params), n, None, s_rng))
        real = np.asarray(synth_images(r_rng, n))
        noise = np.asarray(jax.random.uniform(n_rng, real.shape))
        print(f"FID(gen, real)   = {fid_score(gen, real):8.3f}  "
              "(random-conv proxy features)")
        print(f"FID(noise, real) = {fid_score(noise, real):8.3f}  "
              "(uninformed baseline, should be much larger)")


if __name__ == "__main__":
    main()
