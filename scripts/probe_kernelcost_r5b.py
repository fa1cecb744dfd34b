"""Microkernel probe: per-unit costs of the binned walk's inner pieces.

Grid of 512 blocks (the OBJ bounce-1 shape).  Every block runs exactly:
  NDMA   pipelined 8 KB group DMAs (double-buffered, as production)
  NSUB   sub-leaf AABB tests
  NTRI   triangle tests (the production tri_body, 4x unrolled fori)
on a (16, 128) ray block.  Sweeping each count gives the real marginal
cost per DMA / per AABB test / per triangle test including all scalar
and loop overheads — the numbers the counter-based cost model needs.
"""
import sys, time, statistics
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_binned as wbn
from raytracer_tpu.ops.pallas.wavefront_stream import TRI_ROWS_PAD

R = 16
LANES = 128
NBLOCKS = 512
GROUP = 128


def make_kernel(ndma, nsub, ntri):
    def kernel(suba_ref, tri_hbm, out_ref, tri_smem, dma_sem):
        i = pl.program_id(0)
        ox = jnp.full((R, LANES), 0.1) + out_ref[0] * 0.0
        oy = jnp.full((R, LANES), 0.2)
        oz = jnp.full((R, LANES), -0.3)
        dx = jnp.full((R, LANES), 0.57735)
        dy = jnp.full((R, LANES), 0.57735)
        dz = jnp.full((R, LANES), -0.57735)
        inv_x, inv_y, inv_z = wbn._safe_inv_dir(dx, dy, dz)
        alive = jnp.ones((R, LANES), jnp.bool_)
        zero = jnp.zeros((R, LANES), jnp.float32)
        one = jnp.ones((R, LANES), jnp.float32)
        hs = (jnp.full((R, LANES), wbn.BIG), zero, zero, one,
              zero, zero, zero, zero, zero, one)

        # --- DMAs: pipelined double buffer over ndma groups ------------
        if ndma:
            def dma_for(g, slot):
                return pltpu.make_async_copy(
                    tri_hbm.at[:, pl.ds((g % 8) * GROUP, GROUP)],
                    tri_smem.at[slot], dma_sem.at[slot])
            dma_for(0, 0).start()

            def dma_body(g, acc):
                @pl.when(g + 1 < ndma)
                def _():
                    dma_for(g + 1, (g + 1) & 1).start()
                dma_for(g, g & 1).wait()
                return acc + tri_smem[g & 1, 0, 0]
            acc = jax.lax.fori_loop(0, ndma, dma_body, jnp.float32(0.0))
        else:
            acc = jnp.float32(0.0)

        # --- sub AABB tests -------------------------------------------
        def sub_body(k, hs):
            p = wbn._aabb_test(suba_ref, k % 64, ox, oy, oz, inv_x,
                               inv_y, inv_z, hs[0], alive)
            anyp = jnp.max(jnp.where(p, 1.0, 0.0))
            t0 = jnp.where(anyp > 0.0, hs[0], hs[0])
            return (t0,) + hs[1:]
        if nsub:
            hs = jax.lax.fori_loop(0, nsub, sub_body, hs)

        # --- triangle tests (production body, 4x unroll) ---------------
        tri_body = wf._make_tri_body(
            lambda row, t: tri_smem[0, row, t], False,
            ox, oy, oz, dx, dy, dz)

        def tri4(q, c):
            tj = (q % 8) * 4
            for u in range(4):
                c = tri_body(tj + u, c)
            return c
        if ntri:
            hs = jax.lax.fori_loop(0, (ntri + 3) >> 2, tri4, hs)

        out_ref[0] = hs[0] + acc
    return kernel


def run_cfg(ndma, nsub, ntri, tri_hbm, suba):
    kernel = make_kernel(ndma, nsub, ntri)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, R, LANES), lambda i, *p: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((2, TRI_ROWS_PAD, GROUP), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((1, NBLOCKS * R, LANES),
                                       jnp.float32),
    )(suba, tri_hbm)


def timeit(tag, fn):
    jf = jax.jit(fn)
    _ = float(jnp.sum(jf()))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _k in range(4):
            out = jf()
        _ = float(jnp.sum(out))
        t4 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _k in range(8):
            out = jf()
        _ = float(jnp.sum(out))
        t8 = time.perf_counter() - t0
        ts.append((t8 - t4) / 4)
    v = statistics.median(ts)
    print(f"{tag:24s} {v*1e3:8.3f} ms", flush=True)
    return v


def make_kernel_loops(nloops, ntri_per, dyn):
    """nloops tiny tri-fori loops per block, trip count static or read
    from SMEM (the production shape: one dynamic fori per sub-leaf)."""
    def kernel(subn_ref, tri_hbm, out_ref, tri_smem, dma_sem):
        ox = jnp.full((R, LANES), 0.1) + out_ref[0] * 0.0
        oy = jnp.full((R, LANES), 0.2)
        oz = jnp.full((R, LANES), -0.3)
        dx = jnp.full((R, LANES), 0.57735)
        dy = jnp.full((R, LANES), 0.57735)
        dz = jnp.full((R, LANES), -0.57735)
        zero = jnp.zeros((R, LANES), jnp.float32)
        one = jnp.ones((R, LANES), jnp.float32)
        hs = (jnp.full((R, LANES), wbn.BIG), zero, zero, one,
              zero, zero, zero, zero, zero, one)
        tri_body = wf._make_tri_body(
            lambda row, t: tri_smem[0, row, t], False,
            ox, oy, oz, dx, dy, dz)

        def outer(k, hs):
            if dyn:
                n = subn_ref[0, k % 64]
            else:
                n = ntri_per

            def tri4(q, c):
                tj = (q % 8) * 4
                for u in range(4):
                    c = tri_body(tj + u, c)
                return c
            return jax.lax.fori_loop(0, (n + 3) >> 2, tri4, hs)
        hs = jax.lax.fori_loop(0, nloops, outer, hs)
        out_ref[0] = hs[0]
    return kernel


def run_loops(nloops, ntri_per, dyn, tri_hbm, subn):
    kernel = make_kernel_loops(nloops, ntri_per, dyn)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, R, LANES), lambda i, *p: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((2, TRI_ROWS_PAD, GROUP), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((1, NBLOCKS * R, LANES),
                                       jnp.float32),
    )(subn, tri_hbm)


def make_kernel_scatter(ndma, span_groups, stride):
    """ndma pipelined DMAs per block from a WIDE table: group index
    walks `stride` groups per step modulo span_groups (stride=0 repeats
    one window; large prime strides emulate the scattered production
    pattern)."""
    def kernel(subn_ref, tri_hbm, out_ref, tri_smem, dma_sem):
        blk = pl.program_id(0)

        def dma_for(g, slot):
            gi = (blk * 7 + g * stride) % span_groups if stride else g % 8
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(gi * GROUP, GROUP)],
                tri_smem.at[slot], dma_sem.at[slot])
        dma_for(0, 0).start()
        dma_for(1, 1).start()
        dma_for(2, 2).start()

        def dma_body(g, acc):
            @pl.when(g + 3 < ndma)
            def _():
                dma_for(g + 3, (g + 3) & 3).start()
            dma_for(g, g & 3).wait()
            return acc + tri_smem[g & 3, 0, 0]
        acc = jax.lax.fori_loop(0, ndma, dma_body, jnp.float32(0.0))
        out_ref[0] = jnp.full((R, LANES), acc)
    return kernel


def run_scatter(ndma, span_groups, stride, tri_hbm, subn):
    kernel = make_kernel_scatter(ndma, span_groups, stride)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, R, LANES), lambda i, *p: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((4, TRI_ROWS_PAD, GROUP), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((1, NBLOCKS * R, LANES),
                                       jnp.float32),
    )(subn, tri_hbm)


def make_kernel_dynslot(ntri, dyn_slot):
    """Production-shaped tri grind: reads from tri_smem[slot, row, t]
    where slot is a TRACED scalar (dyn_slot) or static 0."""
    def kernel(subn_ref, tri_hbm, out_ref, tri_smem, dma_sem):
        ox = jnp.full((R, LANES), 0.1) + out_ref[0] * 0.0
        oy = jnp.full((R, LANES), 0.2)
        oz = jnp.full((R, LANES), -0.3)
        dx = jnp.full((R, LANES), 0.57735)
        dy = jnp.full((R, LANES), 0.57735)
        dz = jnp.full((R, LANES), -0.57735)
        zero = jnp.zeros((R, LANES), jnp.float32)
        one = jnp.ones((R, LANES), jnp.float32)
        hs = (jnp.full((R, LANES), wbn.BIG), zero, zero, one,
              zero, zero, zero, zero, zero, one)

        def outer(g, hs):
            if dyn_slot:
                tri_body = wf._make_tri_body(
                    lambda row, t: tri_smem[g & 3, row, t], False,
                    ox, oy, oz, dx, dy, dz)
            else:
                tri_body = wf._make_tri_body(
                    lambda row, t: tri_smem[0, row, t], False,
                    ox, oy, oz, dx, dy, dz)

            def tri4(q, c):
                tj = (q % 8) * 4
                for u in range(4):
                    c = tri_body(tj + u, c)
                return c
            return jax.lax.fori_loop(0, 8, tri4, hs)
        hs = jax.lax.fori_loop(0, ntri // 32, outer, hs)
        out_ref[0] = hs[0]
    return kernel


def run_dynslot(ntri, dyn_slot, tri_hbm, subn):
    kernel = make_kernel_dynslot(ntri, dyn_slot)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, R, LANES), lambda i, *p: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((4, TRI_ROWS_PAD, GROUP), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((1, NBLOCKS * R, LANES),
                                       jnp.float32),
    )(subn, tri_hbm)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    tri_hbm = jnp.asarray(rng.random((TRI_ROWS_PAD, 1024), np.float32))
    suba = jnp.asarray(
        rng.random((6, 64), np.float32) * 0.5 - 1.0)
    scatter_mode = len(sys.argv) > 1 and sys.argv[1] == "scatter"
    if not scatter_mode:
        base = timeit("base(0,0,0)",
                      lambda: run_cfg(0, 0, 0, tri_hbm, suba))
        for tag, cfg in [
            ("dma16", (16, 0, 0)), ("dma64", (64, 0, 0)),
            ("tri32", (1, 0, 32)), ("tri128", (1, 0, 128)),
        ]:
            timeit(f"{tag}{cfg}",
                   lambda cfg=cfg: run_cfg(*cfg, tri_hbm, suba))
    if len(sys.argv) > 1 and sys.argv[1] == "scatter":
        big = jnp.asarray(rng.random((TRI_ROWS_PAD, 2048 * 128),
                                     np.float32))  # 25 MB table
        subn2 = jnp.asarray(np.full((1, 64), 32, np.int32))
        for tag, cfg in [
            ("repeat64", (64, 2048, 0)),
            ("scatter64", (64, 2048, 997)),
            ("near64", (64, 2048, 1)),
        ]:
            timeit(tag, lambda cfg=cfg: run_scatter(*cfg, big, subn2))
    if len(sys.argv) > 1 and sys.argv[1] == "dynslot":
        subn3 = jnp.asarray(np.full((1, 64), 32, np.int32))
        timeit("static128", lambda: run_dynslot(128, False, tri_hbm, subn3))
        timeit("dyn128", lambda: run_dynslot(128, True, tri_hbm, subn3))
        timeit("static512", lambda: run_dynslot(512, False, tri_hbm, subn3))
        timeit("dyn512", lambda: run_dynslot(512, True, tri_hbm, subn3))
