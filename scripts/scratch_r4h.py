import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
N_BYTES = 8192 * 16 * 128 * 4  # 64 MB

def bench(name, make_fn, nbytes=N_BYTES, R=8):
    f = jax.jit(make_fn(R))
    _ = float(f(0))
    t0 = time.perf_counter()
    for i in range(3):
        _ = float(f(i + 1))
    t1 = time.perf_counter()
    per = (t1 - t0) / 3 / R
    bw = 2 * nbytes / per / 1e9
    print(f"{name}: {per*1e3:.2f} ms ({bw:.0f} GB/s rw)", flush=True)

state = jax.random.normal(key, (8192, 2048), jnp.float32)

def mk_copy(R):
    def f(s):
        st = state + s
        for i in range(R):
            st = st + 1.0
        return st[0, 0]
    return f
bench("copy (x+1) 64MB", mk_copy)

for rows, width in [(8192, 2048), (2048, 8192), (1024, 16384), (512, 32768)]:
    st = state.reshape(rows, width)
    perm = jax.random.permutation(key, jnp.arange(rows, dtype=jnp.int32))
    def mk_take(R, st=st, perm=perm):
        def f(s):
            x = st + s
            for i in range(R):
                x = x[perm]
            return x[0, 0]
        return f
    bench(f"take rows={rows} chunk={width*4//1024}KB", mk_take)
