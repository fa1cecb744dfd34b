import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from scratch_r4 import timeit

N = 1 << 20
NPIX = 512 * 512
SPP = 4
key = jax.random.PRNGKey(0)
pix = jax.random.permutation(key, jnp.arange(N, dtype=jnp.int32)) // SPP
rgb = jax.random.normal(key, (N, 3), jnp.float32)

@jax.jit
def scat(pix, rgb, s):
    return jnp.zeros((NPIX, 3), jnp.float32).at[pix + s - s].add(rgb)
dt = timeit(lambda s: scat(pix, rgb, s))
print(f"scatter-add 1M->262k: {dt*1e3:.2f} ms", flush=True)

lin = jax.random.permutation(key, jnp.arange(N, dtype=jnp.int32))
@jax.jit
def sort_acc(lin, rgb, s):
    order = jnp.argsort(lin + s - s)
    return rgb[order].reshape(NPIX, SPP, 3).sum(axis=1)
dt = timeit(lambda s: sort_acc(lin, rgb, s))
print(f"argsort+gather+reduce 1M: {dt*1e3:.2f} ms", flush=True)

# full 15-plane state sort at 1M
state = jax.random.normal(key, (15, N), jnp.float32)
keys = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
@jax.jit
def state_sort(keys, state, s):
    order = jnp.argsort(keys + s - s)
    return state[:, order]
dt = timeit(lambda s: state_sort(keys, state, s))
print(f"state sort 15x1M: {dt*1e3:.2f} ms", flush=True)
