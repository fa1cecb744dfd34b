import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)

@jax.jit
def trivial(s):
    return s + 1.0
_ = float(trivial(0.0))
t0 = time.perf_counter()
for i in range(20):
    _ = float(trivial(float(i)))
t1 = time.perf_counter()
rpc = (t1 - t0) / 20
print(f"RPC round trip (scalar): {rpc*1e3:.2f} ms", flush=True)

# big copy, not fusible: force separate kernels via optimization barrier
big = jax.random.normal(key, (64, 1024, 2048), jnp.float32)  # 512 MB
@jax.jit
def copy_chain(s, R=4):
    x = big + s
    for i in range(R):
        x = jax.lax.optimization_barrier(x + 1.0)
    return x[0, 0, 0]
_ = float(copy_chain(0.0))
t0 = time.perf_counter()
for i in range(3):
    _ = float(copy_chain(float(i + 1)))
t1 = time.perf_counter()
per_call = (t1 - t0) / 3
per_rep = (per_call - rpc) / 5  # 5 reads+writes of 512MB (incl. big+s)
print(f"copy 512MB x5 barriers: {per_call*1e3:.1f} ms/call -> "
      f"{2 * big.nbytes / per_rep / 1e9:.0f} GB/s", flush=True)

# gather 64MB rows=8192 with barriers, subtract RPC
state = jax.random.normal(key, (8192, 2048), jnp.float32)
perm = jax.random.permutation(key, jnp.arange(8192, dtype=jnp.int32))
@jax.jit
def take_chain(s, R=8):
    x = state + s
    for i in range(R):
        x = jax.lax.optimization_barrier(x[perm])
    return x[0, 0]
_ = float(take_chain(0.0))
t0 = time.perf_counter()
for i in range(3):
    _ = float(take_chain(float(i + 1)))
t1 = time.perf_counter()
per_call = (t1 - t0) / 3
per_rep = (per_call - rpc) / 8
print(f"take 8K x 8KB rows: {per_rep*1e3:.2f} ms/rep -> "
      f"{2 * state.nbytes / per_rep / 1e9:.0f} GB/s", flush=True)
