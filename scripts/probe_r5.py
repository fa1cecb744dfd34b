"""Round-5 platform probes behind the binned-engine redesign.

Questions (each one a go/no-go for a specific engine change):
  P1  per-12KB-group HBM->SMEM DMA cost (round-4 baseline: 2.2 GB/s fill)
  P2  do back-to-back SMEM DMAs overlap?  (two in-flight: if the fill
      rate is a port limit there is no win; if per-DMA latency, it halves)
  P3  VMEM->SMEM copy rate (staging HBM->VMEM at 171 GB/s then
      VMEM->SMEM would beat direct HBM->SMEM if the SMEM write port is
      not the bottleneck)
  P4  does a STATIC-index scalar read from VMEM scratch lower at all,
      and at what per-read-broadcast cost (a fully unrolled triangle
      grind could then skip SMEM entirely)
  P5  does VPU compute overlap an in-flight SMEM DMA (start; grind;
      wait) — the cheap alternative to double buffering

Timing: (t(2R) - t(R)) / R over paired kernels differing only in rep
count — both calls pay the same RPC/dispatch constant (axon tunnel
methodology, ROUND4_NOTES)."""
import statistics
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 24          # TRI_ROWS_PAD
GROUP = 128        # 12 KB group (24 rows x 128 cols f32)
REPS = 2048


def timed_pair(make_run, reps, *args):
    r1 = make_run(reps)
    r2 = make_run(2 * reps)

    @jax.jit
    def s1(*a):
        return jnp.sum(r1(*a))

    @jax.jit
    def s2(*a):
        return jnp.sum(r2(*a))
    _ = float(s1(*args))
    _ = float(s2(*args))
    deltas = []
    for _t in range(7):
        t0 = time.perf_counter()
        _ = float(s1(*args))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(s2(*args))
        tb = time.perf_counter() - t0
        deltas.append((tb - ta) / reps)
    return statistics.median(deltas)


def _call(kernel, scratch_shapes, hbm):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda i, *p: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch_shapes,
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.zeros((1,), jnp.int32), hbm)


def p1_serial_dma():
    def make_run(reps):
        def kernel(dummy, hbm_ref, out_ref, scratch, sem):
            def body(i, acc):
                dma = pltpu.make_async_copy(
                    hbm_ref.at[:, pl.ds((i % 16) * GROUP, GROUP)],
                    scratch, sem)
                dma.start()
                dma.wait()
                return acc + scratch[0, 0]
            acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            out_ref[...] = jnp.full((8, 128), acc)

        def run(hbm):
            return _call(kernel,
                         [pltpu.SMEM((ROWS, GROUP), jnp.float32),
                          pltpu.SemaphoreType.DMA(())], hbm)
        return run

    hbm = jax.random.normal(jax.random.PRNGKey(0), (ROWS, GROUP * 16))
    dt = timed_pair(make_run, REPS, hbm)
    bw = ROWS * GROUP * 4 / dt / 1e9
    print(f"P1 serial 12KB HBM->SMEM: {dt*1e6:.2f} us/DMA = {bw:.1f} GB/s")


def p2_double_buffer():
    def make_run(reps):
        def kernel(dummy, hbm_ref, out_ref, s0, s1, sem0, sem1):
            def body(i, acc):
                a = pltpu.make_async_copy(
                    hbm_ref.at[:, pl.ds((2 * i % 16) * GROUP, GROUP)],
                    s0, sem0)
                b = pltpu.make_async_copy(
                    hbm_ref.at[:, pl.ds(((2 * i + 1) % 16) * GROUP,
                                        GROUP)], s1, sem1)
                a.start()
                b.start()
                a.wait()
                acc = acc + s0[0, 0]
                b.wait()
                return acc + s1[0, 0]
            acc = jax.lax.fori_loop(0, reps // 2, body, jnp.float32(0.0))
            out_ref[...] = jnp.full((8, 128), acc)

        def run(hbm):
            return _call(kernel,
                         [pltpu.SMEM((ROWS, GROUP), jnp.float32),
                          pltpu.SMEM((ROWS, GROUP), jnp.float32),
                          pltpu.SemaphoreType.DMA(()),
                          pltpu.SemaphoreType.DMA(())], hbm)
        return run

    hbm = jax.random.normal(jax.random.PRNGKey(0), (ROWS, GROUP * 16))
    dt = timed_pair(make_run, REPS, hbm)
    bw = ROWS * GROUP * 4 / dt / 1e9
    print(f"P2 double-buffered:       {dt*1e6:.2f} us/DMA = {bw:.1f} GB/s")


def p3_vmem_to_smem():
    def make_run(reps):
        def kernel(dummy, hbm_ref, out_ref, vstage, scratch, sem, sem2):
            big = pltpu.make_async_copy(hbm_ref, vstage, sem2)
            big.start()
            big.wait()

            def body(i, acc):
                dma = pltpu.make_async_copy(
                    vstage.at[:, pl.ds((i % 16) * GROUP, GROUP)],
                    scratch, sem)
                dma.start()
                dma.wait()
                return acc + scratch[0, 0]
            acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            out_ref[...] = jnp.full((8, 128), acc)

        def run(hbm):
            return _call(kernel,
                         [pltpu.VMEM((ROWS, GROUP * 16), jnp.float32),
                          pltpu.SMEM((ROWS, GROUP), jnp.float32),
                          pltpu.SemaphoreType.DMA(()),
                          pltpu.SemaphoreType.DMA(())], hbm)
        return run

    hbm = jax.random.normal(jax.random.PRNGKey(0), (ROWS, GROUP * 16))
    dt = timed_pair(make_run, REPS, hbm)
    bw = ROWS * GROUP * 4 / dt / 1e9
    print(f"P3 VMEM->SMEM:            {dt*1e6:.2f} us/DMA = {bw:.1f} GB/s")


def p4_static_vmem_read():
    # an outer fori re-executes a 128-read static unroll; the loop-carried
    # multiply keeps the reads from being hoisted/CSE'd
    def make_run(reps):
        def kernel(dummy, hbm_ref, out_ref, vstage, sem):
            big = pltpu.make_async_copy(hbm_ref, vstage, sem)
            big.start()
            big.wait()

            def body(i, acc):
                s = acc * 1e-30
                for j in range(128):
                    s = s + vstage[j % ROWS, j]
                return s
            acc = jax.lax.fori_loop(
                0, reps // 128, body, jnp.zeros((8, 128), jnp.float32))
            out_ref[...] = acc

        def run(hbm):
            return _call(kernel,
                         [pltpu.VMEM((ROWS, GROUP), jnp.float32),
                          pltpu.SemaphoreType.DMA(())], hbm)
        return run

    hbm = jax.random.normal(jax.random.PRNGKey(0), (ROWS, GROUP))
    try:
        dt = timed_pair(make_run, REPS * 8, hbm)
        print(f"P4 static VMEM read+broadcast: {dt*1e9:.1f} ns/read "
              f"(LOWERS)")
    except Exception as e:
        print(f"P4 static VMEM scalar read: DOES NOT LOWER "
              f"({type(e).__name__}: {str(e)[:150]})")


def p5_overlap_compute():
    # start DMA; W reps of (16,128) vector work; wait.  If compute hides
    # under the DMA, time(W) stays flat until W's cost passes the DMA's.
    for W in (0, 16, 64, 256):
        def make_run(reps, W=W):
            def kernel(dummy, hbm_ref, out_ref, scratch, sem):
                def body(i, carry):
                    acc, v = carry
                    dma = pltpu.make_async_copy(
                        hbm_ref.at[:, pl.ds((i % 16) * GROUP, GROUP)],
                        scratch, sem)
                    dma.start()

                    def compute(j, v):
                        return v * 1.000001 + 0.5
                    v = jax.lax.fori_loop(0, W, compute, v)
                    dma.wait()
                    return acc + scratch[0, 0], v
                acc, v = jax.lax.fori_loop(
                    0, reps, body,
                    (jnp.float32(0.0), jnp.ones((16, 128), jnp.float32)))
                out_ref[...] = jnp.full((8, 128), acc) + jnp.mean(v)

            def run(hbm):
                return _call(kernel,
                             [pltpu.SMEM((ROWS, GROUP), jnp.float32),
                              pltpu.SemaphoreType.DMA(())], hbm)
            return run

        hbm = jax.random.normal(jax.random.PRNGKey(0),
                                (ROWS, GROUP * 16))
        dt = timed_pair(make_run, REPS, hbm)
        print(f"P5 start/compute(W={W:3d})/wait: {dt*1e6:.2f} us/iter")


if __name__ == "__main__":
    for name in sys.argv[1:] or ["p1", "p2", "p3", "p4", "p5"]:
        {"p1": p1_serial_dma, "p2": p2_double_buffer,
         "p3": p3_vmem_to_smem, "p4": p4_static_vmem_read,
         "p5": p5_overlap_compute}[name]()
