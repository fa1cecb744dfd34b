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
for i in range(10):
    _ = float(trivial(float(i)))
RPC = (time.perf_counter() - t0) / 10

def bench(name, fn, R):
    f = jax.jit(fn)
    _ = float(f(0))
    t0 = time.perf_counter()
    for i in range(3):
        _ = float(f(i + 1))
    per = ((time.perf_counter() - t0) / 3 - RPC) / R
    print(f"{name}: {per*1e3:.2f} ms/rep", flush=True)

N = 1 << 20
st = jax.random.normal(key, (N, 16), jnp.float32)
perm = jax.random.permutation(key, jnp.arange(N, dtype=jnp.int32))
def mk(s):
    x = st + s
    for i in range(4):
        x = jax.lax.optimization_barrier(x[perm])
    return x[0, 0]
bench("take (1M,16) 64B chunks", mk, 4)

stp = jax.random.normal(key, (16, N), jnp.float32)
def mk_t(s):
    x = stp + s
    for i in range(4):
        x = jax.lax.optimization_barrier(x.T.reshape(N, 16))
        x = jax.lax.optimization_barrier(x.reshape(16, N))  # fake back
    return x[0, 0]
bench("transpose (16,1M)->(1M,16)", mk_t, 8)

# gather plane-major for reference
def mk_pm(s):
    x = stp + s
    for i in range(4):
        x = jax.lax.optimization_barrier(x[:, perm])
    return x[0, 0]
bench("take (16,1M) plane-major elementwise", mk_pm, 4)

# combined: transpose -> rowtake -> transpose
def mk_combo(s):
    x = stp + s
    for i in range(2):
        xr = x.T.reshape(N, 16)
        xr = xr[perm]
        x = jax.lax.optimization_barrier(xr.reshape(N, 16).T)
    return x[0, 0]
bench("T + take(N,16) + T", mk_combo, 2)
