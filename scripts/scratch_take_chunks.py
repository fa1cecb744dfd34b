import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
RPC = None

@jax.jit
def trivial(s):
    return s + 1.0
_ = float(trivial(0.0))
t0 = time.perf_counter()
for i in range(10):
    _ = float(trivial(float(i)))
RPC = (time.perf_counter() - t0) / 10
print(f"RPC: {RPC*1e3:.1f} ms", flush=True)

def bench(name, fn, R):
    f = jax.jit(fn)
    _ = float(f(0))
    t0 = time.perf_counter()
    for i in range(3):
        _ = float(f(i + 1))
    per = ((time.perf_counter() - t0) / 3 - RPC) / R
    print(f"{name}: {per*1e3:.2f} ms/rep", flush=True)

N = 1 << 20
for rows, width in [(32768, 512), (65536, 256), (16384, 1024)]:
    st = jax.random.normal(key, (rows, width), jnp.float32)
    perm = jax.random.permutation(key, jnp.arange(rows, dtype=jnp.int32))
    def mk(s, st=st, perm=perm):
        x = st + s
        for i in range(6):
            x = jax.lax.optimization_barrier(x[perm])
        return x[0, 0]
    bench(f"take {rows} x {width*4}B chunks", mk, 6)

# argsort of N keys alone
keys = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
def mk_as(s):
    k = keys + s
    acc = jnp.int32(0)
    for i in range(4):
        o = jnp.argsort(k + i)
        acc = acc + o[0]
        k = jnp.bitwise_xor(k, o)
    return acc + 0.0
bench("argsort 1M", mk_as, 4)

# argsort of 32768 row keys
rk = jax.random.randint(key, (32768,), 0, 1 << 30, dtype=jnp.int32)
def mk_as2(s):
    k = rk + s
    acc = jnp.int32(0)
    for i in range(6):
        o = jnp.argsort(k + i)
        acc = acc + o[0]
        k = jnp.bitwise_xor(k, o)
    return acc + 0.0
bench("argsort 32k", mk_as2, 6)
