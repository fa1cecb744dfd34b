import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

A = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.float32)
@jax.jit
def mm(A, s):
    return jnp.sum((A + s) @ A)   # scalar output: fetch is free
out = mm(A, 0); _ = float(out)
for trial in range(3):
    t0 = time.perf_counter()
    vals = [float(mm(A, i + 10 * trial)) for i in range(5)]
    t1 = time.perf_counter()
    print(f"matmul 8192^3 w/ host fetch: {(t1-t0)/5*1e3:.2f} ms -> {2*8192**3/((t1-t0)/5)/1e12:.1f} TFLOP/s", flush=True)

N = 1 << 20
keys = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, 1 << 30, dtype=jnp.int32)
state = jax.random.normal(jax.random.PRNGKey(2), (15, N), jnp.float32)
@jax.jit
def state_sort(keys, state, s):
    order = jnp.argsort(keys + s)
    st = state[:, order]
    return jnp.sum(st)
_ = float(state_sort(keys, state, 0))
for trial in range(2):
    t0 = time.perf_counter()
    vals = [float(state_sort(keys, state, i + 10 * trial)) for i in range(5)]
    t1 = time.perf_counter()
    print(f"state sort 15x1M w/ host fetch: {(t1-t0)/5*1e3:.2f} ms", flush=True)

# scatter-add
SPP = 4; NPIX = 512 * 512
pix = jax.random.permutation(jax.random.PRNGKey(3), jnp.arange(N, dtype=jnp.int32)) // SPP
rgb = jax.random.normal(jax.random.PRNGKey(4), (N, 3), jnp.float32)
@jax.jit
def scat(pix, rgb, s):
    return jnp.sum(jnp.zeros((NPIX, 3), jnp.float32).at[pix].add(rgb + s))
_ = float(scat(pix, rgb, 0))
t0 = time.perf_counter()
vals = [float(scat(pix, rgb, i)) for i in range(5)]
t1 = time.perf_counter()
print(f"scatter-add 1M w/ host fetch: {(t1-t0)/5*1e3:.2f} ms", flush=True)
