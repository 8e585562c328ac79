import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from flax import linen as nn
from handpose_tpu.ops.pallas_kernels import max_pool_3x3s2p1_bwd_pallas

N, H, W, C = 1, 16, 16, 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
dy = jnp.asarray(rng.normal(size=(N, H//2, W//2, C)).astype(np.float32))

f = lambda v: nn.max_pool(v, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
_, vjp = jax.vjp(f, x)
want = np.asarray(jax.jit(lambda g: vjp(g)[0])(dy))
got = np.asarray(jax.jit(max_pool_3x3s2p1_bwd_pallas)(x, dy))

mis = (want != 0) != (got != 0)
print("mismatch fraction:", mis.mean(), flush=True)
# where do mismatches live? per (row, col) counts over channels
per_rc = mis[0].sum(-1)
np.set_printoptions(linewidth=200)
print("per-(h,w) mismatch counts:\n", per_rc, flush=True)
# channel profile
print("per-channel mismatch:", mis[0].sum((0, 1)), flush=True)
d = np.abs(want - got)[0].sum(-1)
print("per-(h,w) absdiff:\n", np.round(d, 2), flush=True)
