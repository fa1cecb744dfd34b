"""Does Pallas TPU scratch persist across grid steps?"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(dummy, out_ref, smem, vmem):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        smem[0] = 0
        vmem[...] = jnp.zeros((8, 128), jnp.float32)

    smem[0] = smem[0] + 1
    vmem[...] = vmem[...] + 1.0
    out_ref[...] = vmem[...] + jnp.float32(smem[0]) * 1000.0

@jax.jit
def run():
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(4,),
            in_specs=[],
            out_specs=pl.BlockSpec((8, 128), lambda i, *p: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                            pltpu.VMEM((8, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(jnp.zeros((1,), jnp.int32))

out = np.asarray(run())
print("per-block values:", [out[i * 8, 0] for i in range(4)])
