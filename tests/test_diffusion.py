"""Tests for the 1-D conditional diffusion stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handpose_tpu.nn.diffusion import (DiffusionJointEstimation,
                                       DiffusionSchedule, Unet1D,
                                       cosine_beta_schedule,
                                       linear_beta_schedule)


def test_beta_schedules_match_reference_formulas():
    """Schedule constants must match the torch buffers bit-for-bit in f32."""
    torch = pytest.importorskip("torch")

    for T in (50, 400):
        lin = linear_beta_schedule(T)
        tlin = torch.linspace(1000 / T * 1e-4, 1000 / T * 0.02, T,
                              dtype=torch.float64).numpy()
        np.testing.assert_allclose(lin, tlin, rtol=1e-12)
        cos = cosine_beta_schedule(T)
        steps = T + 1
        x = torch.linspace(0, T, steps, dtype=torch.float64)
        ac = torch.cos(((x / T) + 0.008) / 1.008 * np.pi * 0.5) ** 2
        ac = ac / ac[0]
        tcos = torch.clip(1 - ac[1:] / ac[:-1], 0, 0.999).numpy()
        np.testing.assert_allclose(cos, tcos, rtol=1e-10)


def test_schedule_loss_weights():
    s = DiffusionSchedule(100, "cosine", "pred_noise")
    np.testing.assert_allclose(s.loss_weight, np.ones(100))
    sv = DiffusionSchedule(100, "cosine", "pred_v")
    assert np.all(sv.loss_weight < 1.0)


def test_unet1d_shapes():
    net = Unet1D(dim=16, dim_mults=(1, 2, 4, 8), channels=1,
                 condition_feat_dim=32)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 63, 1))
    t = jnp.zeros((2,), jnp.int32)
    cond = jnp.zeros((2, 32))
    params = net.init(rng, x, t, cond)
    out = net.apply(params, x, t, cond)
    assert out.shape == (2, 63, 1)


def test_diffusion_loss_and_ddim_sample():
    mod = DiffusionJointEstimation(condition_feat_dim=32, num_timesteps=8,
                                   num_sampling_timesteps=4, dim=16)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (2, 1, 63))
    cond = jax.random.normal(rng, (2, 32))
    params = mod.init(rng, x0, cond, rng)
    loss = mod.apply(params, x0, cond, rng)
    assert np.isfinite(loss) and loss.shape == ()

    sample = jax.jit(lambda p, c, r: mod.apply(p, c, r, method=mod.sample))(
        params, cond, rng)
    assert sample.shape == (2, 1, 63)
    assert np.all(np.isfinite(sample))


def test_ddim_scan_unroll_equivalent():
    """sampler_unroll only restructures the lax.scan (XLA schedules k
    steps together; ~10% p50 win on v5e, tools/bench_ddim_unroll.py) --
    the sampled trajectory must match unroll=1 up to fusion-
    reassociation ulps."""
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (2, 1, 63))
    cond = jax.random.normal(rng, (2, 32))
    init_noise = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 63))

    outs = []
    for unroll in (1, 4):
        mod = DiffusionJointEstimation(condition_feat_dim=32,
                                       num_timesteps=8,
                                       num_sampling_timesteps=4, dim=16,
                                       sampler_unroll=unroll)
        params = mod.init(rng, x0, cond, rng)
        outs.append(np.asarray(jax.jit(
            lambda p, c, r: mod.apply(p, c, r, method=mod.sample,
                                      init_noise=init_noise))(
            params, cond, rng)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


def test_sampler_hoist_equivalent():
    """sampler_hoist precomputes the time/cond embedding MLPs and every
    block's time projection as (S, B, .) tables outside the scan -- the
    SAME matmuls batched over steps instead of recomputed per step.  The
    sampled trajectory must match the unhoisted sampler to reassociation
    ulps, for both DDIM and ancestral DDPM."""
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.uniform(rng, (2, 1, 63))
    cond = jax.random.normal(rng, (2, 32))
    init_noise = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 63))

    for sampling in (4, 8):          # 4 -> DDIM; 8 == T -> DDPM ancestral
        outs = []
        for hoist in (False, True):
            mod = DiffusionJointEstimation(condition_feat_dim=32,
                                           num_timesteps=8,
                                           num_sampling_timesteps=sampling,
                                           dim=16, sampler_hoist=hoist)
            params = mod.init(rng, x0, cond, rng)
            outs.append(np.asarray(jax.jit(
                lambda p, c, r: mod.apply(p, c, r, method=mod.sample,
                                          init_noise=init_noise))(
                params, cond, rng)))
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-5,
                                   err_msg=f"sampling={sampling}")


def test_ddpm_ancestral_sampler():
    mod = DiffusionJointEstimation(condition_feat_dim=16, num_timesteps=6,
                                   num_sampling_timesteps=6, dim=16)  # no DDIM
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(rng, (2, 1, 63))
    cond = jax.random.normal(rng, (2, 16))
    params = mod.init(rng, x0, cond, rng)
    sample = mod.apply(params, cond, rng, method=mod.sample)
    assert sample.shape == (2, 1, 63)
    assert np.all(np.isfinite(sample))


def test_ddim_time_pairs_match_reference():
    """The PRODUCTION ladder (nn.diffusion.ddim_time_pairs, the one
    ddim_sample scans over) must reproduce torch.linspace().int()'s
    reversed pairing."""
    torch = pytest.importorskip("torch")
    from handpose_tpu.nn.diffusion import ddim_time_pairs

    for total, sampling in [(400, 200), (8, 4), (100, 33)]:
        times = list(reversed(
            torch.linspace(-1, total - 1, steps=sampling + 1).int()
            .tolist()))
        ref = [[a, b] for a, b in zip(times[:-1], times[1:])]
        assert ddim_time_pairs(total, sampling).tolist() == ref


def test_unet2d_and_generic_diffusion():
    from handpose_tpu.nn.diffusion2d import GaussianDiffusion, Unet2D

    net = Unet2D(dim=16, dim_mults=(1, 2), channels=3, condition_feat_dim=8)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.zeros((2,), jnp.int32)
    c = jnp.zeros((2, 8))
    p = net.init(jax.random.PRNGKey(0), x, t, c)
    assert net.apply(p, x, t, c).shape == (2, 8, 8, 3)

    gd = GaussianDiffusion((8, 8, 3), timesteps=6, sampling_timesteps=3)
    rng = jax.random.PRNGKey(1)
    denoise = lambda xx, tt, cc: net.apply(p, xx, tt, cc)
    loss = gd.loss(denoise, jax.random.uniform(rng, (2, 8, 8, 3)), c, rng)
    assert np.isfinite(loss)
    s = gd.sample(denoise, 2, c, rng)
    assert s.shape == (2, 8, 8, 3) and np.all(np.isfinite(s))


@pytest.mark.slow
def test_diffusion2d_learns():
    """The 2-D DDPM actually LEARNS (reference scratchpad
    example/diffusionExample.py:189-573 trains on CIFAR): short training
    on synthetic stripe images must drive the denoising loss well below
    its initial value, and the structural invariant of the data
    (channel1 == 1 - channel0) must emerge in fresh samples."""
    import optax

    from handpose_tpu.nn.diffusion2d import GaussianDiffusion, Unet2D

    size = 8

    def synth(rng, batch):
        k1, k2 = jax.random.split(rng)
        ang = jax.random.uniform(k1, (batch,), minval=0, maxval=np.pi)
        freq = jax.random.uniform(k2, (batch,), minval=1.0, maxval=3.0)
        yy, xx = jnp.meshgrid(jnp.linspace(0, 1, size),
                              jnp.linspace(0, 1, size), indexing="ij")
        proj = (xx[None] * jnp.cos(ang)[:, None, None] +
                yy[None] * jnp.sin(ang)[:, None, None])
        img = 0.5 + 0.5 * jnp.sin(2 * np.pi * freq[:, None, None] * proj)
        return jnp.stack([img, 1 - img, img ** 2], axis=-1)

    net = Unet2D(dim=16, dim_mults=(1, 2), channels=3)
    gd = GaussianDiffusion((size, size, 3), timesteps=20)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((4, size, size, 3)),
                      jnp.zeros((4,), jnp.int32), None)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def denoise(p):
        return lambda x, t, c: net.apply(p, x, t, c)

    @jax.jit
    def step(params, opt_state, rng):
        d_rng, n_rng = jax.random.split(rng)
        x0 = synth(d_rng, 32)
        loss, grads = jax.value_and_grad(
            lambda p: gd.loss(denoise(p), x0, None, n_rng))(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(400):
        rng, srng = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, srng)
        losses.append(float(loss))
    first, last = np.mean(losses[:20]), np.mean(losses[-20:])
    assert last < 0.5 * first, (first, last)

    samples = np.asarray(gd.sample(denoise(params), 8, None,
                                   jax.random.PRNGKey(9)))
    assert np.all(np.isfinite(samples))
    # learned structure: ch1 ~= 1 - ch0 (data invariant); untrained noise
    # violates it by ~its full scale
    mismatch = np.mean(np.abs(samples[..., 0] + samples[..., 1] - 1.0))
    assert mismatch < 0.35, mismatch


def test_fid_frechet_math_and_proxy_features():
    """FID machinery (reference diffusionExample.py:293-370 counterpart):
    the Frechet distance matches the closed form for 1-D Gaussians, is ~0
    for identical distributions, and the random-conv proxy features
    separate matched image sets from noise."""
    from handpose_tpu.utils.fid import fid_score, frechet_distance

    rng = np.random.default_rng(0)
    # closed form for D-dim diagonal Gaussians:
    # sum (mu1-mu2)^2 + sum (s1 - s2)^2
    a = rng.normal(0.0, 1.0, (20000, 3))
    b = rng.normal([2.0, 0.0, -1.0], [1.0, 3.0, 0.5], (20000, 3))
    # means (0,0,0) vs (2,0,-1): 4+0+1; sigmas (1,1,1) vs (1,3,0.5):
    # 0 + 2^2 + 0.5^2
    expect = (4.0 + 0.0 + 1.0) + (0.0 + 4.0 + 0.25)
    got = frechet_distance(a, b)
    assert abs(got - expect) / expect < 0.05, (got, expect)
    assert frechet_distance(a, a) < 1e-6

    # proxy features: same-distribution image sets score far below noise
    def stripes(seed, n, size=16):
        r = np.random.default_rng(seed)
        ang = r.uniform(0, np.pi, n)
        f = r.uniform(1, 3, n)
        yy, xx = np.meshgrid(np.linspace(0, 1, size),
                             np.linspace(0, 1, size), indexing="ij")
        proj = (xx[None] * np.cos(ang)[:, None, None] +
                yy[None] * np.sin(ang)[:, None, None])
        img = 0.5 + 0.5 * np.sin(2 * np.pi * f[:, None, None] * proj)
        return np.stack([img, 1 - img, img ** 2], -1).astype(np.float32)

    real1, real2 = stripes(1, 256), stripes(2, 256)
    noise = np.random.default_rng(3).uniform(
        size=real1.shape).astype(np.float32)
    close = fid_score(real1, real2)
    far = fid_score(noise, real2)
    assert far > 5 * close, (close, far)
