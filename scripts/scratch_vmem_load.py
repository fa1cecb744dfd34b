import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE = sys.argv[1]

def kernel(dummy, tab_ref, out_ref):
    acc = jnp.zeros((8, 128), jnp.float32)
    if MODE == "fori128":
        def body(i, acc):
            return acc + tab_ref[0, i]
        acc = jax.lax.fori_loop(0, 128, body, acc)
    elif MODE == "fori_nested":
        def body(k, acc):
            def inner(q, acc):
                return acc + tab_ref[3, k * 32 + q]
            return jax.lax.fori_loop(0, 32, inner, acc)
        acc = jax.lax.fori_loop(0, 4, body, acc)
    elif MODE == "dyn_trips":
        def body(k, acc):
            n = jnp.minimum(k * 7 % 33, 32)
            def inner(q, acc):
                return acc + tab_ref[3, k * 32 + q]
            return jax.lax.fori_loop(0, n, inner, acc)
        acc = jax.lax.fori_loop(0, 4, body, acc)
    elif MODE == "dynrow":
        def body(k, acc):
            def inner(q, acc):
                return acc + tab_ref[k * 24 + 3, q]
            return jax.lax.fori_loop(0, 128, inner, acc)
        acc = jax.lax.fori_loop(0, 4, body, acc)
    out_ref[...] = acc

@jax.jit
def run(tab):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.zeros((1,), jnp.int32), tab)

tab = jax.random.normal(jax.random.PRNGKey(0), (192, 128), jnp.float32)
out = run(tab)
print(MODE, "ok", float(jnp.sum(out)))
