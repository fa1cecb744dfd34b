"""Microbenchmark: MXU matmul-form triangle intersection vs the
scalar-broadcast fori loop.

Both kernels test 2048 rays x NTRI triangles per block and reduce to a
per-ray (t_best, winner_idx) — the deferred-attribute formulation.  The
fori loop is the current engine's cost model; the matmul form computes
the 8 dot products per (ray, tri) pair on the MXU:

  num   = td - n.o        -> [o,1] @ [n | -d? ]   (K=4)
  nd    = n.d             -> [d]   @ [n]          (K=3)
  E_k   = (og_k - w_k)    -> [o,1] @ [g_k | -w_k]
  dg_k  = d.g_k           -> [d]   @ [g_k]

and does the in-range + edge tests div-free (sign-corrected by nd), then
tree-reduces (num, nd, idx) with cross-multiplied compares.
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

R = 16
LANES = 128
NTRI = 128
T_MIN = np.float32(0.001)
BIG = np.float32(3.0e38)
REPS = 64
GRID = 8
import os
PREC = os.environ.get('PREC', 'highest')
UNROLL = int(os.environ.get('UNROLL', '1'))    # groups ground per kernel call


def make_fori_kernel():
    def kernel(tri_ref, o_ref, d_ref, t_ref, i_ref):
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

        def tri_body(ti, carry):
            t_best, idx = carry
            tnx = tri_ref[0, ti]
            tny = tri_ref[1, ti]
            tnz = tri_ref[2, ti]
            td = tri_ref[3, ti]
            nd = tnx * dx + tny * dy + tnz * dz
            no = tnx * ox + tny * oy + tnz * oz
            par = jnp.abs(nd) < 1e-8
            nd_safe = jnp.where(par, 1.0, nd)
            t = (td - no) / nd_safe
            ok = (~par) & (t >= T_MIN)
            e0 = (ox * tri_ref[4, ti] + oy * tri_ref[5, ti]
                  + oz * tri_ref[6, ti]
                  + t * (dx * tri_ref[4, ti] + dy * tri_ref[5, ti]
                         + dz * tri_ref[6, ti]) - tri_ref[7, ti])
            ok &= e0 >= 0.0
            e1 = (ox * tri_ref[8, ti] + oy * tri_ref[9, ti]
                  + oz * tri_ref[10, ti]
                  + t * (dx * tri_ref[8, ti] + dy * tri_ref[9, ti]
                         + dz * tri_ref[10, ti]) - tri_ref[11, ti])
            ok &= e1 >= 0.0
            e2 = (ox * tri_ref[12, ti] + oy * tri_ref[13, ti]
                  + oz * tri_ref[14, ti]
                  + t * (dx * tri_ref[12, ti] + dy * tri_ref[13, ti]
                         + dz * tri_ref[14, ti]) - tri_ref[15, ti])
            ok &= e2 >= 0.0
            better = ok & (t <= t_best)
            return (jnp.where(better, t, t_best),
                    jnp.where(better, ti, idx))

        t_best = jnp.full((R, LANES), BIG)
        idx = jnp.full((R, LANES), -1, jnp.int32)

        def tri_bodyU(tu, carry):
            for u in range(UNROLL):
                carry = tri_body(tu * UNROLL + u, carry)
            return carry

        def rep_body(rep, carry):
            t_best, idx = jax.lax.fori_loop(0, NTRI // UNROLL, tri_bodyU,
                                            carry)
            return (t_best + 1e-30, idx)

        t_best, idx = jax.lax.fori_loop(0, REPS, rep_body, (t_best, idx))
        t_ref[...] = t_best
        i_ref[...] = idx

    return kernel


@jax.jit
def run_fori(tri_smem, o3, d3):
    return pl.pallas_call(
        make_fori_kernel(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)],
        ),
        out_shape=[jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((R, LANES), jnp.int32)],
    )(tri_smem, o3, d3)


def make_mxu_kernel():
    N = R * LANES

    def kernel(dummy_ref, w4_ref, w3_ref, o_ref, d_ref, ti_ref,
               t_ref, i_ref):
        o4 = o_ref[...]                                       # (4, N)
        d3 = d_ref[...]                                       # (3, N)

        t_best0 = jnp.full((1, N), BIG)
        idx0 = jnp.full((1, N), -1, jnp.int32)

        def rep_body(rep, carry):
            t_best, idx = carry
            # A-side: (NTRI*4, 4) @ (4, N) -> rows [num|E0|E1|E2] x NTRI
            A = jax.lax.dot_general(
                w4_ref[...], o4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST if PREC == 'highest' else jax.lax.Precision.HIGH if PREC == 'high' else jax.lax.Precision.DEFAULT))
            B = jax.lax.dot_general(
                w3_ref[...], d3, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST if PREC == 'highest' else jax.lax.Precision.HIGH if PREC == 'high' else jax.lax.Precision.DEFAULT))
            num = A[0:NTRI]            # td - no   (w4 rows built so)
            nd = B[0:NTRI]
            E0 = A[NTRI:2 * NTRI]
            dg0 = B[NTRI:2 * NTRI]
            E1 = A[2 * NTRI:3 * NTRI]
            dg1 = B[2 * NTRI:3 * NTRI]
            E2 = A[3 * NTRI:]
            dg2 = B[3 * NTRI:]
            # sign-corrected div-free tests: t = num/nd; multiplying each
            # inequality by sgn = sign(nd) keeps one compare direction
            pos = nd > 0.0
            sgn = jnp.where(pos, 1.0, -1.0)
            apar = jnp.abs(nd) >= 1e-8
            # t >= T_MIN  <=>  (num - T_MIN*nd) * sgn >= 0
            ok = apar & ((num - T_MIN * nd) * sgn >= 0.0)
            # t <= t_best  <=>  (t_best*nd - num) * sgn >= 0
            ok &= ((t_best * nd - num) * sgn >= 0.0)
            # edges: e_k = E_k + t*dg_k >= 0  <=>  (E_k*nd + num*dg_k)*sgn
            ok &= (E0 * nd + num * dg0) * sgn >= 0.0
            ok &= (E1 * nd + num * dg1) * sgn >= 0.0
            ok &= (E2 * nd + num * dg2) * sgn >= 0.0
            # normalize sign so nd >= 0, mask invalid
            numn = num * sgn
            ndn = nd * sgn
            numn = jnp.where(ok, numn, BIG)
            ndn = jnp.where(ok, ndn, 1.0)
            tri_i = ti_ref[...]
            # tree reduce (numn, ndn, idx): a/b <= c/d <=> a*d <= c*b
            cn, cd, cidx = numn, ndn, tri_i
            half = NTRI // 2
            while half >= 1:
                a_n, b_n = cn[:half], cn[half:2 * half]
                a_d, b_d = cd[:half], cd[half:2 * half]
                a_i, b_i = cidx[:half], cidx[half:2 * half]
                take_b = b_n * a_d < a_n * b_d
                cn = jnp.where(take_b, b_n, a_n)
                cd = jnp.where(take_b, b_d, a_d)
                cidx = jnp.where(take_b, b_i, a_i)
                half //= 2
            # candidate winner vs carry
            tw = cn[0:1] / cd[0:1]
            win_ok = tw < BIG
            better = win_ok & (tw <= t_best)
            t_best = jnp.where(better, tw, t_best)
            idx = jnp.where(better, cidx[0:1].astype(jnp.int32), idx)
            t_best = t_best + 1e-30
            return (t_best, idx)

        t_best, idx = jax.lax.fori_loop(0, REPS, rep_body,
                                        (t_best0, idx0))
        t_ref[...] = t_best
        i_ref[...] = idx

    return kernel


@jax.jit
def run_mxu(w4, w3, o3, d3):
    return pl.pallas_call(
        make_mxu_kernel(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)],
        ),
        out_shape=[jax.ShapeDtypeStruct((1, R * LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, R * LANES), jnp.int32)],
    )(jnp.zeros((1,), jnp.int32), w4, w3,
      jnp.concatenate([o3.reshape(3, -1),
                       jnp.ones((1, R * LANES), jnp.float32)]),
      d3.reshape(3, -1),
      jnp.broadcast_to(jnp.arange(NTRI, dtype=jnp.float32)[:, None],
                       (NTRI, R * LANES)))


def main():
    rng = np.random.default_rng(0)
    # random but plausible triangles near origin
    v0 = rng.normal(size=(NTRI, 3)) * 0.5
    v1 = v0 + rng.normal(size=(NTRI, 3)) * 0.1
    v2 = v0 + rng.normal(size=(NTRI, 3)) * 0.1
    n = np.cross(v1 - v0, v2 - v0)
    d = np.einsum("ij,ij->i", n, v0)
    g0 = np.cross(n, v1 - v0)
    g1 = np.cross(n, v2 - v1)
    g2 = np.cross(n, v0 - v2)
    w0 = np.einsum("ij,ij->i", v0, g0)
    w1 = np.einsum("ij,ij->i", v1, g1)
    w2 = np.einsum("ij,ij->i", v2, g2)

    tri = np.zeros((16, NTRI), np.float32)
    tri[0:3] = n.T
    tri[3] = d
    tri[4:7] = g0.T
    tri[7] = w0
    tri[8:11] = g1.T
    tri[11] = w1
    tri[12:15] = g2.T
    tri[15] = w2

    # w4 rows: [num rows: -n | +d], [E0: g0 | -w0], ...
    w4 = np.zeros((4 * NTRI, 4), np.float32)
    w4[0:NTRI, 0:3] = -n
    w4[0:NTRI, 3] = d
    w4[NTRI:2 * NTRI, 0:3] = g0
    w4[NTRI:2 * NTRI, 3] = -w0
    w4[2 * NTRI:3 * NTRI, 0:3] = g1
    w4[2 * NTRI:3 * NTRI, 3] = -w1
    w4[3 * NTRI:, 0:3] = g2
    w4[3 * NTRI:, 3] = -w2
    w3 = np.zeros((4 * NTRI, 3), np.float32)
    w3[0:NTRI] = n
    w3[NTRI:2 * NTRI] = g0
    w3[2 * NTRI:3 * NTRI] = g1
    w3[3 * NTRI:] = g2

    o = rng.normal(size=(3, R, LANES)).astype(np.float32) * 2.0
    dvec = rng.normal(size=(3, R, LANES)).astype(np.float32)
    dvec /= np.linalg.norm(dvec, axis=0, keepdims=True)

    tri_j = jnp.asarray(tri)
    o_j = jnp.asarray(o)
    d_j = jnp.asarray(dvec)
    w4_j = jnp.asarray(w4)
    w3_j = jnp.asarray(w3)

    tf, idf = run_fori(tri_j, o_j, d_j)
    tm, idm = run_mxu(w4_j, w3_j, o_j, d_j)
    tm = jnp.asarray(tm).reshape(R, LANES)
    idm = jnp.asarray(idm).reshape(R, LANES)
    tf = np.asarray(tf)
    tm = np.asarray(tm)
    hitf = tf < 1e30
    hitm = tm < 1e30
    agree = (hitf == hitm).mean()
    terr = np.abs(tf[hitf & hitm] - tm[hitf & hitm]).max() if (
        hitf & hitm).any() else 0.0
    iderr = (np.asarray(idf)[hitf & hitm]
             != np.asarray(idm)[hitf & hitm]).mean()
    print(f"hit agreement {agree:.6f}, max t err {terr:.2e}, "
          f"idx mismatch {iderr:.4f}", flush=True)

    def timeit(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [f(*a) for _ in range(12)]
        jax.block_until_ready(outs)
        t1 = time.perf_counter()
        outs = [f(*a) for _ in range(24)]
        jax.block_until_ready(outs)
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / 12

    dt_f = timeit(run_fori, tri_j, o_j, d_j)
    dt_f /= GRID
    pairs = REPS * NTRI * R * LANES
    print(f"fori: {dt_f*1e3:.3f} ms -> {dt_f/ (REPS*NTRI) *1e9:.1f} ns per "
          f"2048-lane tri ({pairs/dt_f/1e9:.1f} Gpairs/s)", flush=True)
    dt_m = timeit(run_mxu, w4_j, w3_j, o_j, d_j)
    dt_m /= GRID
    print(f"mxu:  {dt_m*1e3:.3f} ms -> {dt_m/ (REPS*NTRI) *1e9:.1f} ns per "
          f"2048-lane tri ({pairs/dt_m/1e9:.1f} Gpairs/s)", flush=True)


if __name__ == "__main__":
    main()
