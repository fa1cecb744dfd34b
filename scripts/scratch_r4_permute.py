"""Micro-benchmark: Pallas DMA row-permute vs XLA gather.

State (ROWS, P, 128) f32 in HBM; permute rows by a scalar-prefetched
schedule.  Row granularity = 128 rays x P planes = 8 KB per DMA.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8192
P = 16
BLK = 16   # rows per block


def permute_kernel(sched_ref, state_ref, out_ref, bufs, in_sems, out_sems):
    blk = pl.program_id(0)

    def in_dma(j, slot):
        r = sched_ref[blk * BLK + j]
        return pltpu.make_async_copy(state_ref.at[r], bufs.at[slot],
                                     in_sems.at[slot])

    def out_dma(j, slot):
        return pltpu.make_async_copy(bufs.at[slot], out_ref.at[blk * BLK + j],
                                     out_sems.at[slot])

    # issue all input DMAs up front (16 in flight), then touch + write back
    def issue(j, _):
        in_dma(j, j).start()
        return 0

    jax.lax.fori_loop(0, BLK, issue, 0)

    def body(j, _):
        in_dma(j, j).wait()
        # trivial compute: add 1 in place
        bufs[j] = bufs[j] + 1.0
        out_dma(j, j).start()
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)

    def drain(j, _):
        out_dma(j, j).wait()
        return 0

    jax.lax.fori_loop(0, BLK, drain, 0)


@jax.jit
def permute(sched, state):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ROWS // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((BLK, P, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((BLK,)),
            pltpu.SemaphoreType.DMA((BLK,)),
        ],
    )
    return pl.pallas_call(
        permute_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, P, 128), jnp.float32),
    )(sched, state)


def main():
    key = jax.random.PRNGKey(0)
    state = jax.random.normal(key, (ROWS, P, 128), jnp.float32)
    sched = jax.random.permutation(key, jnp.arange(ROWS, dtype=jnp.int32))

    out = permute(sched, state)
    ref = (state[sched] + 1.0)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"correct: max err = {err}", flush=True)

    R = 8

    @jax.jit
    def chain(sched, state):
        for i in range(R):
            state = permute(sched, state)
        return jnp.sum(state[0])

    _ = float(chain(sched, state))
    t0 = time.perf_counter()
    for i in range(3):
        _ = float(chain(sched, state + i))
    t1 = time.perf_counter()
    per = (t1 - t0) / 3 / R
    print(f"pallas row-permute {ROWS}x{P}x128: {per*1e3:.2f} ms/permute",
          flush=True)

    @jax.jit
    def xla_chain(sched, state):
        for i in range(R):
            state = state[sched] + 1.0
        return jnp.sum(state[0])

    _ = float(xla_chain(sched, state))
    t0 = time.perf_counter()
    for i in range(3):
        _ = float(xla_chain(sched, state + i))
    t1 = time.perf_counter()
    per = (t1 - t0) / 3 / R
    print(f"XLA row take {ROWS}x{P}x128: {per*1e3:.2f} ms/permute", flush=True)


if __name__ == "__main__":
    main()
