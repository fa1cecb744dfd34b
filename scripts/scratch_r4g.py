import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

N = 1 << 20
ROWS = N // 128
key = jax.random.PRNGKey(0)
keys = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
state = jax.random.normal(key, (15, N), jnp.float32)
state3 = state.reshape(15, ROWS, 128)
rowkeys = jax.random.randint(key, (ROWS,), 0, 1 << 30, dtype=jnp.int32)
order_full = jnp.argsort(keys)
order_rows = jnp.argsort(rowkeys)
R = 4

def bench(name, fn, R=R, calls=3):
    f = jax.jit(fn)
    tc = time.perf_counter()
    out = f(0)
    out = out[-1] if isinstance(out, tuple) else out
    _ = float(jnp.sum(out))
    tc = time.perf_counter() - tc
    t0 = time.perf_counter()
    for i in range(calls):
        out = f(i + 1)
        out = out[-1] if isinstance(out, tuple) else out
        _ = float(jnp.sum(out))
    t1 = time.perf_counter()
    per = (t1 - t0) / calls
    print(f"{name}: {per*1e3:.1f} ms/call ({per/R*1e3:.2f} ms/rep) [compile {tc:.1f}s]", flush=True)

which = sys.argv[1]
if which == "a":
    def argsort_chain(s):
        k = keys + s
        acc = jnp.int32(0)
        for i in range(R):
            o = jnp.argsort(k + i)
            acc = acc + o[0]
            k = jnp.bitwise_xor(k, o)
        return acc + 0.0
    bench("argsort 1M alone", argsort_chain)
elif which == "b":
    def gather_chain(s):
        st = state + s
        for i in range(R):
            st = st[:, order_full] + 1.0
        return st
    bench("gather 15x1M (fixed order)", gather_chain)
elif which == "c":
    def rowsort_chain(s):
        k = rowkeys + s
        st = state3 * 1.0
        for i in range(R):
            o = jnp.argsort(k + i)
            st = st[:, o] + 1.0
            k = jnp.bitwise_xor(k, o.astype(jnp.int32))
        return st
    bench("row argsort+rowgather chain", rowsort_chain)
elif which == "d":
    SPP = 4; NPIX = 512 * 512
    slot = jax.random.permutation(key, jnp.arange(N, dtype=jnp.int32))
    rgb = jax.random.normal(key, (N, 3), jnp.float32)
    def scat_unique(s):
        acc = jnp.float32(0)
        for i in range(R):
            img = jnp.zeros((N, 3), jnp.float32).at[slot].set(
                rgb + s + i, unique_indices=True, mode="drop")
            acc = acc + jnp.sum(img.reshape(NPIX, SPP, 3).sum(1))
        return acc
    bench("unique perm scatter+reduce", scat_unique)
elif which == "e":
    for C in (16, 256):
        topb = jax.random.normal(key, (4, C), jnp.float32)
        o3 = jax.random.normal(key, (3, N), jnp.float32)
        d3 = jax.random.normal(key, (3, N), jnp.float32)
        tb = jax.random.uniform(key, (N,), jnp.float32) * 10
        def sel(s, C=C, topb=topb, o3=o3, d3=d3, tb=tb):
            ox, oy, oz = o3[0] + s, o3[1], o3[2]
            dx, dy, dz = d3[0], d3[1], d3[2]
            best = jnp.full((N,), 3e38); besti = jnp.zeros((N,), jnp.int32)
            def body(c, carry):
                best, besti = carry
                bx, by, bz, r2 = topb[0, c], topb[1, c], topb[2, c], topb[3, c]
                ocx, ocy, ocz = ox - bx, oy - by, oz - bz
                hb = ocx * dx + ocy * dy + ocz * dz
                cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
                disc = hb * hb - cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                entry = jnp.maximum(-hb - sq, 0.0)
                ok = (disc >= 0.0) & (entry <= tb)
                e = jnp.where(ok, entry, 3e38)
                better = e < best
                return jnp.where(better, e, best), jnp.where(better, c, besti)
            best, besti = jax.lax.fori_loop(0, C, body, (best, besti))
            return besti + 0.0
        def sel_chain(s, sel=sel):
            acc = jnp.float32(0)
            for i in range(R):
                acc = acc + jnp.sum(sel(s + i))
            return acc
        bench(f"candidate-select C={C}", sel_chain)
