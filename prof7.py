import time
import numpy as np, jax, jax.numpy as jnp
from coslam_tpu.config import MatcherConfig
from coslam_tpu.ops import matching

rng = np.random.default_rng(0)
cfg = MatcherConfig()
N = 1024
dq = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
uq = jnp.asarray(rng.uniform(0, 600, (N, 2)).astype(np.float32))
vq = jnp.asarray(np.ones(N, bool))
B = 64
dts = jnp.asarray(rng.integers(0, 2**32, (B, N, 8), dtype=np.uint32))
uts = jnp.asarray(rng.uniform(0, 600, (B, N, 2)).astype(np.float32))
vts = jnp.asarray(np.ones((B, N), bool))

def step(c, xs):
    dt, ut, vt = xs
    mm = matching.match_windowed(dq, uq, 20.0, vq, dt, ut, vt, cfg,
                                 max_dist=100, mutual=True)
    return c, mm.valid.sum()

f = jax.jit(lambda d, u, v: jax.lax.scan(step, 0, (d, u, v))[1])
jax.block_until_ready(f(dts, uts, vts))
best = np.inf
for _ in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(f(dts, uts, vts))
    best = min(best, time.perf_counter() - t0)
print(f"scan matcher only: {best / B * 1e3:.3f} ms/frame")
