import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, LANES, NTRI = 16, 128, 128
N = R * LANES
STAGE = int(sys.argv[1])

def kernel(dummy, w4_ref, w3_ref, o_ref, d_ref, ti_ref, t_ref):
    o4 = o_ref[...]
    d3 = d_ref[...]
    A = jax.lax.dot_general(w4_ref[...], o4, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    B = jax.lax.dot_general(w3_ref[...], d3, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if STAGE == 0:
        t_ref[...] = jnp.sum(A + B, axis=0, keepdims=True)
        return
    num, nd = A[0:NTRI], B[0:NTRI]
    E0, dg0 = A[NTRI:2*NTRI], B[NTRI:2*NTRI]
    sgn = jnp.where(nd > 0, 1.0, -1.0)
    ok = (jnp.abs(nd) >= 1e-8) & ((num - 0.001 * nd) * sgn >= 0.0)
    ok &= (E0 * nd + num * dg0) * sgn >= 0.0
    numn = jnp.where(ok, num * sgn, 3e38)
    ndn = jnp.where(ok, nd * sgn, 1.0)
    if STAGE == 1:
        t_ref[...] = jnp.sum(numn + ndn, axis=0, keepdims=True)
        return
    if STAGE >= 6:
        tri_i = ti_ref[...]
    else:
        tri_i = jax.lax.broadcasted_iota(jnp.int32, (NTRI, N), 0).astype(
            jnp.float32)
    cn, cd, cidx = numn, ndn, tri_i
    half = NTRI // 2
    lim = 8 if STAGE in (2, 4) else 1
    use_idx = STAGE in (4, 5, 6)
    while half >= lim:
        take_b = cn[half:2*half] * cd[:half] < cn[:half] * cd[half:2*half]
        cn = jnp.where(take_b, cn[half:2*half], cn[:half])
        cd = jnp.where(take_b, cd[half:2*half], cd[:half])
        if use_idx:
            cidx = jnp.where(take_b, cidx[half:2*half], cidx[:half])
        half //= 2
    t_ref[...] = (jnp.sum(cn * cd, axis=0, keepdims=True)
                  + jnp.sum(cidx, axis=0, keepdims=True))

@jax.jit
def run(w4, w3, o4, d3):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
    )(jnp.zeros((1,), jnp.int32), w4, w3, o4, d3,
      jnp.broadcast_to(jnp.arange(NTRI, dtype=jnp.float32)[:, None],
                       (NTRI, N)))

key = jax.random.PRNGKey(0)
w4 = jax.random.normal(key, (4 * NTRI, 4), jnp.float32)
w3 = jax.random.normal(key, (4 * NTRI, 3), jnp.float32)
o4 = jax.random.normal(key, (4, N), jnp.float32)
d3 = jax.random.normal(key, (3, N), jnp.float32)
out = run(w4, w3, o4, d3)
print(f"STAGE {STAGE} ok:", np.asarray(out)[0, :3])
