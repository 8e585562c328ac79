import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from handpose_tpu.ops.pallas_kernels import _moments_pallas_raw

N, C = 64*128*128, 64          # one-quarter stem batch: 134 MB bf16
x = jax.device_put(jnp.asarray(
    np.random.default_rng(0).standard_normal((N, C), np.float32),
    jnp.bfloat16))
shift0 = jnp.zeros((C,), jnp.float32)
print("data ready", flush=True)

def jnp_two(x, shift):
    d = x.astype(jnp.float32) - shift[None]
    return jnp.sum(d, 0), jnp.sum(d*d, 0)

def jnp_fast(x, shift):
    xf = x.astype(jnp.float32) + 0.0 * shift[None]
    return jnp.sum(xf, 0), jnp.sum(xf*xf, 0)

ITER = 30
for name, fn in [("pallas", _moments_pallas_raw), ("jnp_shifted", jnp_two),
                 ("jnp_fast", jnp_fast)]:
    jf = jax.jit(fn)
    s, ss = jf(x, shift0); np.asarray(s)       # compile + settle
    print(name, "compiled", flush=True)
    best = float("inf")
    for _ in range(3):
        shift = shift0
        t0 = time.perf_counter()
        for _ in range(ITER):
            s, ss = jf(x, shift)
            shift = s * 1e-12                  # chain dependency
        np.asarray(s)                          # one final fetch
        best = min(best, time.perf_counter() - t0)
    ms = best / ITER * 1e3
    print(f"{name}: {ms:.3f} ms/iter  ({N*C*2/(ms/1e3)/1e9:.0f} GB/s)",
          flush=True)
