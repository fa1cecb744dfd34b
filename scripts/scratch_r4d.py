import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from scratch_r4 import timeit

A = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.float32)
@jax.jit
def mm(A, s):
    return (A + s) @ A
dt = timeit(lambda s: mm(A, s))
print(f"matmul 8192^3 f32: {dt*1e3:.2f} ms -> {2*8192**3/dt/1e12:.1f} TFLOP/s", flush=True)

N = 1 << 20
keys = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, 1 << 30, dtype=jnp.int32)
state = jax.random.normal(jax.random.PRNGKey(2), (15, N), jnp.float32)
@jax.jit
def state_sort(keys, state, s):
    order = jnp.argsort(keys + s)
    return state[:, order]
# time WITH per-call block (not batched)
out = state_sort(keys, state, 0); jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(10):
    out = state_sort(keys, state, i)
    jax.block_until_ready(out)
t1 = time.perf_counter()
print(f"state sort blocking per call: {(t1-t0)/10*1e3:.2f} ms", flush=True)

@jax.jit
def chain_sort(keys, state, s, reps=8):
    for i in range(reps):
        order = jnp.argsort(keys + s + i)
        state = state[:, order]
        keys = keys + state[0].astype(jnp.int32)
    return keys, state
out = chain_sort(keys, state, 0); jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(5):
    out = chain_sort(keys, state, i)
    jax.block_until_ready(out)
t1 = time.perf_counter()
print(f"8-chained sorts per call: {(t1-t0)/5*1e3:.2f} ms -> per sort {(t1-t0)/5/8*1e3:.2f} ms", flush=True)
