"""Measure DMA bandwidth HBM->SMEM vs HBM->VMEM for the 98KB top span."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 24, 1024
REPS = 256

def make_kernel(space):
    def kernel(dummy, hbm_ref, out_ref, scratch, sem):
        def body(i, acc):
            dma = pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds((i % 16) * COLS, COLS)], scratch, sem)
            dma.start()
            dma.wait()
            if space == "smem":
                return acc + scratch[0, 0]
            return acc + scratch[0, 0]
        acc = jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
        out_ref[...] = jnp.full((8, 128), acc)
    return kernel

for space in ("smem", "vmem"):
    scratch = (pltpu.SMEM((ROWS, COLS), jnp.float32) if space == "smem"
               else pltpu.VMEM((ROWS, COLS), jnp.float32))
    @jax.jit
    def run(hbm):
        return pl.pallas_call(
            make_kernel(space),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(8,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((8, 128),
                                       lambda i, *p: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[scratch, pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.zeros((1,), jnp.int32), hbm)
    hbm = jax.random.normal(jax.random.PRNGKey(0), (ROWS, COLS * 16),
                            jnp.float32)
    @jax.jit
    def runsum(hbm):
        return jnp.sum(run(hbm))
    _ = float(runsum(hbm))
    # RPC baseline
    @jax.jit
    def triv(s):
        return s + 1.0
    _ = float(triv(0.0))
    t0 = time.perf_counter()
    for i in range(10):
        _ = float(triv(float(i)))
    rpc = (time.perf_counter() - t0) / 10
    t0 = time.perf_counter()
    for i in range(5):
        _ = float(runsum(hbm + i))
    per_call = (time.perf_counter() - t0) / 5 - rpc
    per_dma = per_call / (8 * REPS)
    bw = ROWS * COLS * 4 / per_dma / 1e9
    print(f"{space}: {per_dma*1e6:.2f} us per 96KB DMA -> {bw:.1f} GB/s",
          flush=True)
