import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from flax import linen as nn
from handpose_tpu.ops.pallas_kernels import max_pool_3x3s2p1_bwd_pallas

shapes = [tuple(int(v) for v in a.split("x")) for a in sys.argv[1:]] or \
    [(2, 32, 32, 8), (32, 128, 128, 64)]
rng = np.random.default_rng(0)
for (N, H, W, C) in shapes:
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(N, H//2, W//2, C)).astype(np.float32),
                     jnp.bfloat16)
    f = lambda v: nn.max_pool(v, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))
    _, vjp = jax.vjp(f, x)
    native = jax.jit(lambda g: vjp(g)[0])
    want = np.asarray(native(dy), np.float32)
    print(f"--- {N}x{H}x{W}x{C}: native done", flush=True)
    pallas = jax.jit(lambda v, g: max_pool_3x3s2p1_bwd_pallas(v, g))
    t0 = time.perf_counter()
    got = np.asarray(pallas(x, dy), np.float32)
    print(f"pallas compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    print("support", np.array_equal(want != 0, got != 0),
          "close", np.allclose(want, got, rtol=1e-2, atol=1e-2),
          "maxdiff", np.abs(want - got).max(), flush=True)
    for name, fn, args in [("native", native, (dy,)),
                           ("pallas", pallas, (x, dy))]:
        fn(*args).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            r = fn(*args)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt*1e3:.3f} ms/call", flush=True)
