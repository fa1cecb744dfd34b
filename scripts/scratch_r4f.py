import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

# chain R reps INSIDE one jit -> one RPC, R x compute
N = 1 << 20
keys = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, 1 << 30, dtype=jnp.int32)
state = jax.random.normal(jax.random.PRNGKey(2), (15, N), jnp.float32)

def make_chain(R):
    @jax.jit
    def chain(keys, state, s):
        for i in range(R):
            order = jnp.argsort(keys + s + i)
            state = state[:, order]
            keys = jnp.bitwise_xor(keys, order)
        return jnp.sum(state) + jnp.sum(keys)
    return chain

for R in (1, 4, 16):
    ch = make_chain(R)
    _ = float(ch(keys, state, 0))
    t0 = time.perf_counter()
    vals = [float(ch(keys, state, i + 1)) for i in range(3)]
    t1 = time.perf_counter()
    print(f"sort-chain R={R}: {(t1-t0)/3*1e3:.1f} ms/call", flush=True)

# same for scatter-add
SPP = 4; NPIX = 512 * 512
pix = jax.random.permutation(jax.random.PRNGKey(3), jnp.arange(N, dtype=jnp.int32)) // SPP
rgb = jax.random.normal(jax.random.PRNGKey(4), (N, 3), jnp.float32)
def make_scat(R):
    @jax.jit
    def chain(pix, rgb, s):
        acc = jnp.float32(0)
        for i in range(R):
            img = jnp.zeros((NPIX, 3), jnp.float32).at[pix].add(rgb + s + i)
            acc = acc + jnp.sum(img)
        return acc
    return chain
for R in (1, 4, 16):
    ch = make_scat(R)
    _ = float(ch(pix, rgb, 0))
    t0 = time.perf_counter()
    vals = [float(ch(pix, rgb, i + 1)) for i in range(3)]
    t1 = time.perf_counter()
    print(f"scatter-chain R={R}: {(t1-t0)/3*1e3:.1f} ms/call", flush=True)
