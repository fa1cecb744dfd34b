"""Fused Pallas TPU megakernel: the whole path-trace in VMEM.

The XLA wavefront renderer (render.py) materializes the ray state between
scan steps in HBM; at the bench shape that costs ~100 HBM round trips of
multi-MB state per sample.  This kernel keeps EVERYTHING resident:

  grid = (pixel blocks,); each block holds BLOCK = R x 128 rays as (R, 128)
  f32 planes in VMEM/registers, loops samples and bounces with fori_loop,
  and writes only the final accumulated radiance — HBM traffic is one write
  of the image per render.

  The scene rides in scalar-prefetch SMEM arrays (spheres: (11, S) —
  center xyz, radius, r^2, material kind/albedo/fuzz/ir; triangles: (22, T)
  — plane normal, d, edge-test constants g_k and v_k.g_k, unit normal,
  material), and the intersection loop walks primitives with a fori_loop of
  scalar reads broadcast against the ray planes.  Instead of tracking a hit
  INDEX and gathering afterwards (gathers are expensive on the VPU), the
  loop maintains the winning primitive's attributes directly in 12 select
  planes.

Semantics are the reference algorithm exactly as in render.py/_bounce_step
(common.rs:263-285 bounce rules, materials.rs:42-102 scatter rules,
common.rs:60-166 intersections, cube-sample RNG distribution) with the same
pcg3d counter streams, so the kernel agrees with the XLA path to float
rounding (different FMA contractions; tests use small tolerances).

Limits: S and T must fit in SMEM (fine for the reference scenes and the
~500-sphere bench config; the big-mesh config falls back to the XLA path —
see render_fast dispatch in ops/__init__.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...camera import Camera
from ...scene import Scene, DIFFUSE, METAL, DIELECTRIC, EMISSION
from ... import intersect as intersect_mod

LANES = 128
_SEED_MIX = np.uint32(0x85EBCA6B)

# sphere SMEM layout rows
_SPH_CX, _SPH_CY, _SPH_CZ, _SPH_R, _SPH_R2 = 0, 1, 2, 3, 4
_SPH_KIND, _SPH_AR, _SPH_AG, _SPH_AB, _SPH_FUZZ, _SPH_IR = 5, 6, 7, 8, 9, 10
SPH_ROWS = 11

# triangle SMEM layout rows.  The shading normal is NOT stored: it is the
# normalized plane normal, recovered once per bounce by _resolve_tri_normals
# (3 rows saved keeps the ~10k-tri OBJ scene inside the SMEM budget).
# _TRI_EXTRA holds the material's fuzz (metal) or ir (dielectric) — they are
# mutually exclusive by kind, so one row serves both (materials.rs:7-12).
(_TRI_NX, _TRI_NY, _TRI_NZ, _TRI_D,
 _TRI_G0X, _TRI_G0Y, _TRI_G0Z, _TRI_W0,
 _TRI_G1X, _TRI_G1Y, _TRI_G1Z, _TRI_W1,
 _TRI_G2X, _TRI_G2Y, _TRI_G2Z, _TRI_W2,
 _TRI_KIND, _TRI_EXTRA, _TRI_AR, _TRI_AG, _TRI_AB) = range(21)
TRI_ROWS = 21

T_MIN = np.float32(0.001)
BIG = np.float32(3.0e38)


def _pcg3d(x, y, z):
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def _u01(bits):
    # top-24-bit mapping, identical to rng.random_f32_from_bits24 (Mosaic
    # has no uint32->f32 cast; 24 bits fit int32 exactly)
    b24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
    i = pltpu.bitcast(b24, jnp.int32)
    return i.astype(jnp.float32) * jnp.float32(1.0 / 16777215.0)


def pack_spheres(scene: Scene, perm=None) -> np.ndarray:
    """Host-side (SPH_ROWS, S) f32 table; per-sphere material flattened in.
    ``perm`` optionally reorders the columns (cluster_spheres order)."""
    c = np.asarray(scene.sphere_center, np.float32)
    r = np.asarray(scene.sphere_radius, np.float32)
    valid = np.asarray(scene.sphere_valid)
    mat = np.asarray(scene.sphere_mat)
    if perm is not None:
        c, r, valid, mat = c[perm], r[perm], valid[perm], mat[perm]
    kind = np.asarray(scene.materials.kind, np.float32)[mat]
    alb = np.asarray(scene.materials.color, np.float32)[mat]
    fuzz = np.asarray(scene.materials.fuzz, np.float32)[mat]
    ir = np.asarray(scene.materials.ir, np.float32)[mat]
    S = c.shape[0]
    out = np.zeros((SPH_ROWS, S), np.float32)
    out[_SPH_CX], out[_SPH_CY], out[_SPH_CZ] = c[:, 0], c[:, 1], c[:, 2]
    out[_SPH_R] = r
    out[_SPH_R2] = np.where(valid, r * r, -1.0)  # invalid -> r2<0 never hits
    # negative radius flips the geometric normal ((p-c)/r, common.rs:94-95,
    # the RTiOW hollow-glass trick): encoded as kind+4 so the kernel recovers
    # the sign without an extra select plane in the intersection loop
    out[_SPH_KIND] = kind + np.where(valid & (r < 0.0), 4.0, 0.0)
    out[_SPH_AR], out[_SPH_AG], out[_SPH_AB] = alb[:, 0], alb[:, 1], alb[:, 2]
    out[_SPH_FUZZ] = fuzz
    out[_SPH_IR] = ir
    # invalid spheres: push center far away AND r2<0 (the r2<0 mask is the
    # real guard; the far center keeps disc strongly negative)
    out[_SPH_CX] = np.where(valid, out[_SPH_CX], 1e9)
    return out


def pack_triangles(scene: Scene, perm=None) -> np.ndarray:
    """Host-side (TRI_ROWS, T) f32 table of precomputed plane/edge constants
    (the ScenePack quantities, intersect.py).  ``perm`` optionally reorders
    the columns (cluster_triangles order)."""
    v0 = np.asarray(scene.tri_v0, np.float64)
    v1 = np.asarray(scene.tri_v1, np.float64)
    v2 = np.asarray(scene.tri_v2, np.float64)
    valid = np.asarray(scene.tri_valid)
    mat = np.asarray(scene.tri_mat)
    if perm is not None:
        v0, v1, v2 = v0[perm], v1[perm], v2[perm]
        valid, mat = valid[perm], mat[perm]
    kind = np.asarray(scene.materials.kind, np.float32)[mat]
    alb = np.asarray(scene.materials.color, np.float32)[mat]
    fuzz = np.asarray(scene.materials.fuzz, np.float32)[mat]
    ir = np.asarray(scene.materials.ir, np.float32)[mat]
    n = np.cross(v1 - v0, v2 - v0)
    d = np.einsum("ij,ij->i", n, v0)
    g0 = np.cross(n, v1 - v0)
    g1 = np.cross(n, v2 - v1)
    g2 = np.cross(n, v0 - v2)
    w0 = np.einsum("ij,ij->i", v0, g0)
    w1 = np.einsum("ij,ij->i", v1, g1)
    w2 = np.einsum("ij,ij->i", v2, g2)
    T = v0.shape[0]
    out = np.zeros((TRI_ROWS, T), np.float32)
    out[_TRI_NX], out[_TRI_NY], out[_TRI_NZ] = n[:, 0], n[:, 1], n[:, 2]
    out[_TRI_D] = d
    out[_TRI_G0X], out[_TRI_G0Y], out[_TRI_G0Z] = g0[:, 0], g0[:, 1], g0[:, 2]
    out[_TRI_W0] = w0
    out[_TRI_G1X], out[_TRI_G1Y], out[_TRI_G1Z] = g1[:, 0], g1[:, 1], g1[:, 2]
    out[_TRI_W1] = w1
    out[_TRI_G2X], out[_TRI_G2Y], out[_TRI_G2Z] = g2[:, 0], g2[:, 1], g2[:, 2]
    out[_TRI_W2] = w2
    out[_TRI_KIND] = kind
    out[_TRI_EXTRA] = np.where(kind == 1.0, fuzz,
                               np.where(kind == 2.0, ir, 0.0))
    out[_TRI_AR], out[_TRI_AG], out[_TRI_AB] = alb[:, 0], alb[:, 1], alb[:, 2]
    # invalid triangles: zero normal -> parallel test rejects every ray
    for row in range(TRI_ROWS):
        out[row] = np.where(valid, out[row], 0.0)
    return out


def _median_split_order(points: np.ndarray, leaf_target: int):
    """BVH-style recursive median split over ``points`` [N, 3].

    Returns (perm, leaf_slices): ``perm`` reorders primitives so every leaf's
    members are contiguous; ``leaf_slices`` is a list of (start, end) into the
    permuted order.  Balanced by construction (split at the median of the
    widest axis), deterministic, host-side numpy only.
    """
    leaves: list[np.ndarray] = []

    def rec(ids: np.ndarray):
        if len(ids) <= leaf_target:
            leaves.append(ids)
            return
        pts = points[ids]
        ax = int(np.argmax(pts.max(axis=0) - pts.min(axis=0)))
        order = np.argsort(pts[:, ax], kind="stable")
        h = len(ids) // 2
        rec(ids[order[:h]])
        rec(ids[order[h:]])

    rec(np.arange(len(points)))
    perm = np.concatenate(leaves) if leaves else np.arange(0)
    slices = []
    off = 0
    for leaf in leaves:
        slices.append((off, off + len(leaf)))
        off += len(leaf)
    return perm, slices


_BOUND_PAD = 1.0 + 1e-4  # conservative f32 padding on cluster bound radii


def _safe_inv_dir(dx, dy, dz):
    """Per-lane 1/d with tiny components clamped (slab test stays finite
    and conservative: an axis-parallel ray outside a slab gets a huge
    positive tnear and misses; inside, the +/-huge pair brackets it)."""
    tiny = jnp.float32(1e-20)

    def inv(v):
        mag = jnp.maximum(jnp.abs(v), tiny)
        return jnp.where(v >= 0.0, 1.0 / mag, -1.0 / mag)

    return inv(dx), inv(dy), inv(dz)


def _aabb_test(ab_ref, ci, ox, oy, oz, idx, idy, idz, t_best, alive):
    """Conservative ray x AABB slab overlap: could any live lane hit
    something inside box ``ci`` closer than its t_best?  Columns of
    ``ab_ref`` are [lox, loy, loz, hix, hiy, hiz]; empty nodes carry
    lo > hi and always miss.  Much tighter than a bounding sphere on the
    flat layouts culling actually meets (balls scattered on a ground
    plane, surface patches of a mesh)."""
    tx0 = (ab_ref[0, ci] - ox) * idx
    tx1 = (ab_ref[3, ci] - ox) * idx
    ty0 = (ab_ref[1, ci] - oy) * idy
    ty1 = (ab_ref[4, ci] - oy) * idy
    tz0 = (ab_ref[2, ci] - oz) * idz
    tz1 = (ab_ref[5, ci] - oz) * idz
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                   jnp.maximum(ty0, ty1)),
                       jnp.maximum(tz0, tz1))
    return (tnear <= tfar) & (tfar > T_MIN) & (tnear <= t_best) & alive


def _aabb_pad_np(lo: np.ndarray, hi: np.ndarray):
    pad = 1e-4 + 1e-5 * np.maximum(np.abs(lo), np.abs(hi))
    return ((lo - pad).astype(np.float32), (hi + pad).astype(np.float32))


def cluster_spheres(scene: Scene, leaf_target: int = 48):
    """Cluster the valid spheres for block-level culling.

    Returns (perm, bounds, ranges): ``perm`` is a permutation of ALL sphere
    columns (valid members leaf-contiguous first, invalid padding last, so it
    feeds straight into ``pack_spheres(scene, perm=...)``); ``bounds`` is
    (4, C) f32 [bcx, bcy, bcz, br^2] bounding spheres; ``ranges`` is (2, C)
    int32 [start, end) member ranges in the permuted table.
    """
    c = np.asarray(scene.sphere_center, np.float64)
    r = np.asarray(scene.sphere_radius, np.float64)
    valid = np.asarray(scene.sphere_valid)
    vidx = np.nonzero(valid)[0]
    perm_v, slices = _median_split_order(c[vidx], leaf_target)
    perm = np.concatenate([vidx[perm_v], np.nonzero(~valid)[0]]).astype(
        np.int64)
    C = max(len(slices), 1)
    bounds = np.zeros((6, C), np.float32)
    bounds[0:3] = 1.0
    bounds[3:6] = -1.0
    ranges = np.zeros((2, C), np.int32)
    for k, (s, e) in enumerate(slices or [(0, 0)]):
        mem = perm[s:e]
        if len(mem) == 0:
            continue
        cm, rm = c[mem], np.abs(r[mem])[:, None]
        lo = (cm - rm).min(axis=0)
        hi = (cm + rm).max(axis=0)
        bounds[0:3, k], bounds[3:6, k] = _aabb_pad_np(lo, hi)
        ranges[0, k], ranges[1, k] = s, e
    return perm, bounds, ranges


def cluster_triangles(scene: Scene, leaf_target: int = 64):
    """Same as cluster_spheres for triangles (split on centroids, bound all
    three vertices)."""
    v0 = np.asarray(scene.tri_v0, np.float64)
    v1 = np.asarray(scene.tri_v1, np.float64)
    v2 = np.asarray(scene.tri_v2, np.float64)
    valid = np.asarray(scene.tri_valid)
    cen = (v0 + v1 + v2) / 3.0
    vidx = np.nonzero(valid)[0]
    perm_v, slices = _median_split_order(cen[vidx], leaf_target)
    perm = np.concatenate([vidx[perm_v], np.nonzero(~valid)[0]]).astype(
        np.int64)
    C = max(len(slices), 1)
    bounds = np.zeros((6, C), np.float32)
    bounds[0:3] = 1.0
    bounds[3:6] = -1.0
    ranges = np.zeros((2, C), np.int32)
    for k, (s, e) in enumerate(slices or [(0, 0)]):
        mem = perm[s:e]
        if len(mem) == 0:
            continue
        verts = np.concatenate([v0[mem], v1[mem], v2[mem]], axis=0)
        bounds[0:3, k], bounds[3:6, k] = _aabb_pad_np(
            verts.min(axis=0), verts.max(axis=0))
        ranges[0, k], ranges[1, k] = s, e
    return perm, bounds, ranges


# ---------------------------------------------------------------------------
# Shared kernel machinery — used by BOTH the SMEM-resident kernel below and
# the HBM-streamed big-scene kernel (wavefront_stream.py) so the physics
# (reference semantics) has a single source of truth.
# ---------------------------------------------------------------------------

def _sphere_loop(sph_ref, sphc_b_ref, sphc_r_ref, n_spheres, n_sph_clusters,
                 ox, oy, oz, dx, dy, dz, alive, hs0, inv_d=None):
    """Closest-hit over SMEM-resident spheres (common.rs:60-98), optionally
    with cluster culling.  hs0 = (t_best, nx, ny, nz, kind, ar, ag, ab, fz,
    irx); nx/ny/nz carry the WINNING CENTER until _sphere_normals."""

    def sph_body(si, hs):
        (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx) = hs
        cx = sph_ref[_SPH_CX, si]
        cy = sph_ref[_SPH_CY, si]
        cz = sph_ref[_SPH_CZ, si]
        r2 = sph_ref[_SPH_R2, si]
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        half_b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = half_b * half_b - cc
        ok = (disc >= 0.0) & (r2 > 0.0)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        root1 = -half_b - sq
        root2 = -half_b + sq
        t = jnp.where(root1 > T_MIN, root1,
                      jnp.where(root2 > T_MIN, root2, BIG))
        t = jnp.where(ok, t, BIG)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        # sphere normal at p: ((p - c)/r).normalize(); defer to
        # after the loop needing (cx, cy, cz, rinv) — store those
        nx = jnp.where(better, cx, nx)
        ny = jnp.where(better, cy, ny)
        nz = jnp.where(better, cz, nz)
        kind = jnp.where(better, sph_ref[_SPH_KIND, si], kind)
        ar = jnp.where(better, sph_ref[_SPH_AR, si], ar)
        ag = jnp.where(better, sph_ref[_SPH_AG, si], ag)
        ab = jnp.where(better, sph_ref[_SPH_AB, si], ab)
        fz = jnp.where(better, sph_ref[_SPH_FUZZ, si], fz)
        irx = jnp.where(better, sph_ref[_SPH_IR, si], irx)
        return (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx)

    if n_sph_clusters > 0:
        # block-level culling: one AABB slab test over the whole
        # wavefront per cluster; when no live lane can beat its current
        # closest hit, the member loop runs with a zero trip count
        # (traced bounds, no cond needed)
        ivx, ivy, ivz = (inv_d if inv_d is not None
                         else _safe_inv_dir(dx, dy, dz))

        def sph_cluster_body(ci, hs):
            t_best = hs[0]
            possible = _aabb_test(sphc_b_ref, ci, ox, oy, oz, ivx, ivy,
                                  ivz, t_best, alive)
            any_p = jnp.max(jnp.where(possible, 1.0, 0.0))
            s0 = jnp.where(any_p > 0.0, sphc_r_ref[0, ci], 0)
            s1 = jnp.where(any_p > 0.0, sphc_r_ref[1, ci], 0)
            return jax.lax.fori_loop(s0, s1, sph_body, hs)

        return jax.lax.fori_loop(0, n_sph_clusters, sph_cluster_body, hs0)
    return jax.lax.fori_loop(0, n_spheres, sph_body, hs0)


def _sphere_loop_lowp(sph_ref, n_spheres, ox, oy, oz, dx, dy, dz, hs0):
    """bfloat16 variant of the sphere closest-hit loop — the
    reduced-precision experiment (the reference's fp_vec.rs 16.16
    fixed-point toy, reimagined for TPU dtypes; see PERFSTUDY "lowp").
    The quadratic (half-b form, common.rs:74-97) runs entirely in bf16;
    the selected t is upcast for the f32 closest-hit compare, so the
    attribute-select chain stays shared.  No cluster culling (the study
    scenes are small).  bf16 shares f32's exponent range, so BIG and the
    disc>=0 guard behave identically — only mantissa precision drops."""
    bf = jnp.bfloat16
    oxl, oyl, ozl = ox.astype(bf), oy.astype(bf), oz.astype(bf)
    dxl, dyl, dzl = dx.astype(bf), dy.astype(bf), dz.astype(bf)

    def sph_body(si, hs):
        (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx) = hs
        cx = sph_ref[_SPH_CX, si]
        cy = sph_ref[_SPH_CY, si]
        cz = sph_ref[_SPH_CZ, si]
        r2f = sph_ref[_SPH_R2, si]
        ocx = oxl - bf(cx)
        ocy = oyl - bf(cy)
        ocz = ozl - bf(cz)
        # the MULTIPLY/FMA chain (the bulk of the loop) runs in bf16;
        # root selection upcasts — Mosaic has no bf16 compare/select
        half_b = (ocx * dxl + ocy * dyl + ocz * dzl).astype(jnp.float32)
        cc = (ocx * ocx + ocy * ocy + ocz * ocz
              - bf(r2f)).astype(jnp.float32)
        disc = half_b * half_b - cc
        ok = (disc >= 0.0) & (r2f > 0.0)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        root1 = -half_b - sq
        root2 = -half_b + sq
        t = jnp.where(root1 > T_MIN, root1,
                      jnp.where(root2 > T_MIN, root2, BIG))
        t = jnp.where(ok, t, BIG)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        nx = jnp.where(better, cx, nx)
        ny = jnp.where(better, cy, ny)
        nz = jnp.where(better, cz, nz)
        kind = jnp.where(better, sph_ref[_SPH_KIND, si], kind)
        ar = jnp.where(better, sph_ref[_SPH_AR, si], ar)
        ag = jnp.where(better, sph_ref[_SPH_AG, si], ag)
        ab = jnp.where(better, sph_ref[_SPH_AB, si], ab)
        fz = jnp.where(better, sph_ref[_SPH_FUZZ, si], fz)
        irx = jnp.where(better, sph_ref[_SPH_IR, si], irx)
        return (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx)

    return jax.lax.fori_loop(0, n_spheres, sph_body, hs0)


def _bound_test(b_ref, ci, ox, oy, oz, dx, dy, dz, t_best, alive):
    """Conservative ray x bounding-sphere overlap test: could any live lane
    hit something inside bound ``ci`` closer than its current t_best?"""
    bcx = b_ref[0, ci]
    bcy = b_ref[1, ci]
    bcz = b_ref[2, ci]
    br2 = b_ref[3, ci]
    ocx = ox - bcx
    ocy = oy - bcy
    ocz = oz - bcz
    hb = ocx * dx + ocy * dy + ocz * dz
    cc = ocx * ocx + ocy * ocy + ocz * ocz - br2
    disc = hb * hb - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    entry = jnp.maximum(-hb - sq, 0.0)
    return (disc >= 0.0) & (-hb + sq > T_MIN) & (entry <= t_best) & alive


def _sphere_normals(ox, oy, oz, dx, dy, dz, hs):
    """Recover the sphere hit normal from the stored winning center:
    normalize(p - c), flipped for negative radii ((p-c)/r, common.rs:94-95;
    the sign rides the kind encoding, kind+4 <=> r<0)."""
    (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx) = hs
    hpx = ox + t_best * dx
    hpy = oy + t_best * dy
    hpz = oz + t_best * dz
    snx = hpx - nx
    sny = hpy - ny
    snz = hpz - nz
    slen = jnp.sqrt(snx * snx + sny * sny + snz * snz)
    slen = jnp.where(slen == 0.0, 1.0, slen)
    neg_r = kind >= 3.5
    slen = jnp.where(neg_r, -slen, slen)
    kind = jnp.where(neg_r, kind - 4.0, kind)
    nx = snx / slen
    ny = sny / slen
    nz = snz / slen
    return (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx), (hpx, hpy, hpz)


def _make_tri_body(read, parity_plane_sign, ox, oy, oz, dx, dy, dz):
    """Triangle closest-hit fori_loop body (common.rs:124-166 via edge
    constants).  ``read(row, i)`` reads one scalar of triangle ``i`` — from
    the SMEM-resident table (SMEM kernel) or a DMA'd leaf buffer (streamed
    kernel)."""

    def tri_body(ti, hs):
        (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx) = hs
        tnx = read(_TRI_NX, ti)
        tny = read(_TRI_NY, ti)
        tnz = read(_TRI_NZ, ti)
        td = read(_TRI_D, ti)
        nd = tnx * dx + tny * dy + tnz * dz
        no = tnx * ox + tny * oy + tnz * oz
        par = jnp.abs(nd) < 1e-8
        nd_safe = jnp.where(par, 1.0, nd)
        if parity_plane_sign:
            t = (no + td) / nd_safe
        else:
            t = (td - no) / nd_safe
        ok = (~par) & (t >= T_MIN)
        g0x = read(_TRI_G0X, ti)
        g0y = read(_TRI_G0Y, ti)
        g0z = read(_TRI_G0Z, ti)
        e0 = (ox * g0x + oy * g0y + oz * g0z
              + t * (dx * g0x + dy * g0y + dz * g0z)
              - read(_TRI_W0, ti))
        ok &= e0 >= 0.0
        g1x = read(_TRI_G1X, ti)
        g1y = read(_TRI_G1Y, ti)
        g1z = read(_TRI_G1Z, ti)
        e1 = (ox * g1x + oy * g1y + oz * g1z
              + t * (dx * g1x + dy * g1y + dz * g1z)
              - read(_TRI_W1, ti))
        ok &= e1 >= 0.0
        g2x = read(_TRI_G2X, ti)
        g2y = read(_TRI_G2Y, ti)
        g2z = read(_TRI_G2Z, ti)
        e2 = (ox * g2x + oy * g2y + oz * g2z
              + t * (dx * g2x + dy * g2y + dz * g2z)
              - read(_TRI_W2, ti))
        ok &= e2 >= 0.0
        # triangle wins ties (<=): common.rs:142 vs World::hit
        better = ok & (t <= t_best)
        t_best = jnp.where(better, t, t_best)
        # carry the PLANE normal; kind+8 marks a triangle winner so
        # _resolve_tri_normals normalizes it once after the loop (the
        # shading normal is normalize(cross(v1-v0, v2-v0)), common.rs:121)
        nx = jnp.where(better, tnx, nx)
        ny = jnp.where(better, tny, ny)
        nz = jnp.where(better, tnz, nz)
        tkind = read(_TRI_KIND, ti)
        textra = read(_TRI_EXTRA, ti)
        kind = jnp.where(better, tkind + 8.0, kind)
        ar = jnp.where(better, read(_TRI_AR, ti), ar)
        ag = jnp.where(better, read(_TRI_AG, ti), ag)
        ab = jnp.where(better, read(_TRI_AB, ti), ab)
        # EXTRA is fuzz for metal, ir for dielectric (mutually exclusive)
        t_met = (tkind >= 0.5) & (tkind < 1.5)
        t_die = (tkind >= 1.5) & (tkind < 2.5)
        fz = jnp.where(better, jnp.where(t_met, textra, 0.0), fz)
        irx = jnp.where(better, jnp.where(t_die, textra, 1.0), irx)
        return (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx)

    return tri_body


def _resolve_tri_normals(hs):
    """Post-triangle-loop fixup: lanes whose winner is a triangle (kind+8
    marker from _make_tri_body) carry the raw PLANE normal — normalize it
    into the shading normal and strip the marker.  One normalize per
    bounce instead of 3 table rows per triangle."""
    (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx) = hs
    is_tri = kind >= 7.5
    ln = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    ln = jnp.where(ln == 0.0, 1.0, ln)
    nx = jnp.where(is_tri, nx / ln, nx)
    ny = jnp.where(is_tri, ny / ln, ny)
    nz = jnp.where(is_tri, nz / ln, nz)
    kind = jnp.where(is_tri, kind - 8.0, kind)
    return (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx)


def _scatter_bookkeep(pix_u, s_u, b, ox, oy, oz, dx, dy, dz, hpx, hpy, hpz,
                      hs, tpr, tpg, tpb, rr, rg, rb, alive, seg):
    """RNG draw + material scatter (materials.rs:30-102) + bounce
    bookkeeping (common.rs:263-285).  Returns the next bounce's carry
    (minus the incremented bounce counter, added by the caller)."""
    (t_best, nx, ny, nz, kind, ar, ag, ab, fz, irx) = hs
    hit = t_best < BIG
    hpx = jnp.where(hit, hpx, ox)
    hpy = jnp.where(hit, hpy, oy)
    hpz = jnp.where(hit, hpz, oz)

    bx, by, bz = _pcg3d(pix_u, s_u, jnp.uint32(1 + b))
    two = jnp.float32(2.0)
    onef = jnp.float32(1.0)
    rx = _u01(bx) * two - onef
    ry = _u01(by) * two - onef
    rz = _u01(bz) * two - onef
    rl = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    rx, ry, rz = rx / rl, ry / rl, rz / rl   # unit cube sample

    # diffuse: normal + rand (degenerate -> normal)
    sdx = nx + rx
    sdy = ny + ry
    sdz = nz + rz
    deg = ((jnp.abs(sdx) < 1e-8) & (jnp.abs(sdy) < 1e-8)
           & (jnp.abs(sdz) < 1e-8))
    sl = jnp.sqrt(sdx * sdx + sdy * sdy + sdz * sdz)
    sl = jnp.where(sl == 0.0, 1.0, sl)
    difx = jnp.where(deg, nx, sdx / sl)
    dify = jnp.where(deg, ny, sdy / sl)
    difz = jnp.where(deg, nz, sdz / sl)

    # metal: reflect + fuzz*rand; absorb below surface
    dn = dx * nx + dy * ny + dz * nz
    rfx = dx - two * dn * nx
    rfy = dy - two * dn * ny
    rfz = dz - two * dn * nz
    mx = rfx + fz * rx
    my = rfy + fz * ry
    mz = rfz + fz * rz
    met_keep = (mx * nx + my * ny + mz * nz) >= 0.0
    ml = jnp.sqrt(mx * mx + my * my + mz * mz)
    ml = jnp.where(ml == 0.0, 1.0, ml)
    metx = mx / ml
    mety = my / ml
    metz = mz / ml

    # dielectric: reference's inverted front-face rule
    inside = dn >= 0.0
    sgn = jnp.where(inside, -onef, onef)
    nex = sgn * nx
    ney = sgn * ny
    nez = sgn * nz
    ratio = jnp.where(inside, onef / irx, irx)
    cos_t = -(dx * nex + dy * ney + dz * nez)
    px = ratio * (dx + cos_t * nex)
    py = ratio * (dy + cos_t * ney)
    pz = ratio * (dz + cos_t * nez)
    pl2 = px * px + py * py + pz * pz
    para = -jnp.sqrt(jnp.abs(onef - pl2))
    qx = px + para * nex
    qy = py + para * ney
    qz = pz + para * nez
    ql = jnp.sqrt(qx * qx + qy * qy + qz * qz)
    ql = jnp.where(ql == 0.0, 1.0, ql)
    diex = qx / ql
    diey = qy / ql
    diez = qz / ql

    is_dif = kind < 0.5
    is_met = (kind >= 0.5) & (kind < 1.5)
    is_die = (kind >= 1.5) & (kind < 2.5)
    is_emi = kind >= 2.5

    scr = jnp.where(is_die, onef, ar)
    scg = jnp.where(is_die, onef, ag)
    scb = jnp.where(is_die, onef, ab)
    ndx = jnp.where(is_dif, difx,
                    jnp.where(is_met, metx,
                              jnp.where(is_die, diex, nx)))
    ndy = jnp.where(is_dif, dify,
                    jnp.where(is_met, mety,
                              jnp.where(is_die, diey, ny)))
    ndz = jnp.where(is_dif, difz,
                    jnp.where(is_met, metz,
                              jnp.where(is_die, diez, nz)))
    term = is_emi | (is_met & ~met_keep)

    # ---- bounce bookkeeping (common.rs:263-285) --------------
    miss = alive & ~hit
    terminal = alive & hit & term
    cont = alive & hit & ~term

    # sky from current direction (dir is unit; renormalize like
    # the reference does is a no-op here up to rounding)
    tsky = jnp.float32(0.5) * (dy + onef)
    skyr = onef - tsky * jnp.float32(0.5)
    skyg = onef - tsky * jnp.float32(0.3)
    skyb = onef

    rr = rr + jnp.where(miss, tpr * skyr,
                        jnp.where(terminal, tpr * scr, 0.0))
    rg = rg + jnp.where(miss, tpg * skyg,
                        jnp.where(terminal, tpg * scg, 0.0))
    rb = rb + jnp.where(miss, tpb * skyb,
                        jnp.where(terminal, tpb * scb, 0.0))
    tpr = jnp.where(cont, tpr * scr, tpr)
    tpg = jnp.where(cont, tpg * scg, tpg)
    tpb = jnp.where(cont, tpb * scb, tpb)
    ox = jnp.where(cont, hpx, ox)
    oy = jnp.where(cont, hpy, oy)
    oz = jnp.where(cont, hpz, oz)
    dx = jnp.where(cont, ndx, dx)
    dy = jnp.where(cont, ndy, dy)
    dz = jnp.where(cont, ndz, dz)
    alive_f = jnp.where(cont, 1.0, 0.0)
    return (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb, alive_f, seg)


def _block_pixel_setup(width, height, shard_rows, R, ntx, seed_ref):
    """Per-block pixel id / activity planes shared by both kernels."""
    blk = pl.program_id(0)
    ty = blk // ntx
    tx = blk - ty * ntx
    # seed_ref[1] is the global row offset and seed_ref[2] the row
    # STRIDE of this invocation's row set — a device's shard under
    # shard_map owns global rows offset, offset+stride, offset+2*stride,
    # ... (stride = n_devices interleaves rows round-robin across the
    # mesh, which load-balances sky-heavy vs bounce-heavy regions; see
    # parallel/sharding.py).  Pixel ids/RNG streams depend only on the
    # global (row, col), so any (offset, stride) tiling is bitwise
    # identical to the matching rows of a single-device render.
    row_offset = seed_ref[1].astype(jnp.int32)
    row_stride = seed_ref[2].astype(jnp.int32)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    band_row = ty * R + lane_row        # row within this shard's band
    prow = row_offset + band_row * row_stride
    pcol = tx * LANES + lane_col
    # lanes outside the image OR outside this shard's row band are dead
    # from the start (band overlap would double-trace and double-count)
    active0 = (prow < height) & (pcol < width) & (band_row < shard_rows)
    prow = jnp.minimum(prow, height - 1)
    pcol = jnp.minimum(pcol, width - 1)
    pix_safe = prow * width + pcol                     # (R,128) int32
    pix_u = pix_safe.astype(jnp.uint32) + seed_ref[0]
    return (active0, prow.astype(jnp.float32), pcol.astype(jnp.float32),
            pix_u)


# leaf slot width of the STREAMED differentiable triangle layout: each
# cull leaf occupies one 128-column (lane-aligned, 12 KB) slot of the
# HBM-resident packed table, DMA'd on demand into SMEM scratch — the
# differentiable path's lift of the SMEM table budget (ops.diff builds
# the aligned table traceably so gradients flow; VERDICT r5 item 3)
STREAM_LEAF_PAD = 128
# row padding of the HBM table (same rule as wavefront_stream.TRI_ROWS_PAD)
STREAM_ROWS_PAD = -(-TRI_ROWS // 8) * 8


def _streamed_tri_walk(hs, *, tri_hbm, tri_smem, dma_sem, tric_b_ref,
                       tric_r_ref, trit_b_ref, trit_r_ref, n_tri_tops,
                       make_body, ox, oy, oz, ivx, ivy, ivz, alive):
    """Two-level culled triangle closest-hit over an HBM-resident
    leaf-aligned table: top nodes (groups of consecutive DFS leaves) gate
    leaf AABB tests; a passing leaf's 128-column slot is DMA'd into SMEM
    and ground by ``make_body(read, ci)`` (``read`` indexes the scratch
    locally; ``ci`` lets the body recover global ids via tric_r)."""
    def cluster_body(ci, hs):
        t_best = hs[0]
        possible = _aabb_test(tric_b_ref, ci, ox, oy, oz, ivx, ivy, ivz,
                              t_best, alive)
        any_p = jnp.max(jnp.where(possible, 1.0, 0.0))
        n = jnp.where(any_p > 0.0,
                      tric_r_ref[1, ci] - tric_r_ref[0, ci], 0)

        @pl.when(any_p > 0.0)
        def _():
            dma = pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(ci * STREAM_LEAF_PAD,
                                    STREAM_LEAF_PAD)],
                tri_smem, dma_sem)
            dma.start()
            dma.wait()

        return jax.lax.fori_loop(0, n, make_body(
            lambda row, i: tri_smem[row, i], ci), hs)

    def top_body(tci, hs):
        t_best = hs[0]
        possible = _aabb_test(trit_b_ref, tci, ox, oy, oz, ivx, ivy, ivz,
                              t_best, alive)
        any_t = jnp.max(jnp.where(possible, 1.0, 0.0))
        c0 = jnp.where(any_t > 0.0, trit_r_ref[0, tci], 0)
        c1 = jnp.where(any_t > 0.0, trit_r_ref[1, tci], 0)
        return jax.lax.fori_loop(c0, c1, cluster_body, hs)

    return jax.lax.fori_loop(0, n_tri_tops, top_body, hs)


def _make_kernel(width, height, spp, depth, n_spheres, n_tris, block_rows,
                 parity_plane_sign, count_all_lanes,
                 n_sph_clusters=0, n_tri_clusters=0, shard_rows=None,
                 lowp=False, tri_stream=False, n_tri_tops=0):
    npix = width * height
    R = block_rows
    if shard_rows is None:
        shard_rows = height
    ntx = pl.cdiv(width, LANES)
    inv_w1 = np.float32(width - 1)
    inv_h1 = np.float32(height - 1)

    def kernel(*refs):
        if tri_stream:
            (cam_ref, sph_ref, sphc_b_ref, sphc_r_ref, tric_b_ref,
             tric_r_ref, trit_b_ref, trit_r_ref, seed_ref, tri_hbm,
             out_ref, tri_smem, dma_sem) = refs
        else:
            (cam_ref, sph_ref, sphc_b_ref, sphc_r_ref, tri_ref,
             tric_b_ref, tric_r_ref, seed_ref, out_ref) = refs
        # blocks are (R x 128)-pixel IMAGE TILES, not linear pixel ranges:
        # a tile's rays form a tight frustum, which is what makes the
        # cluster bound tests below actually cull (a full-width stripe of
        # pixels would touch every cluster every bounce)
        active0, prow_f, pcol_f, pix_u = _block_pixel_setup(
            width, height, shard_rows, R, ntx, seed_ref)

        ox0 = cam_ref[0]
        oy0 = cam_ref[1]
        oz0 = cam_ref[2]
        llcx, llcy, llcz = cam_ref[3], cam_ref[4], cam_ref[5]
        hx, hy, hz = cam_ref[6], cam_ref[7], cam_ref[8]
        vx, vy, vz = cam_ref[9], cam_ref[10], cam_ref[11]

        zero = jnp.zeros((R, LANES), jnp.float32)
        one = jnp.ones((R, LANES), jnp.float32)

        def trace_sample(s, carry):
            # NOTE: loop carries are kept to pure f32 vector planes — Mosaic
            # fails to legalize scf.for with mixed scalar/i1 carries, which
            # is also why the bounce loop below is a static Python unroll.
            acc_r, acc_g, acc_b, seg = carry
            s_u = jnp.uint32(s)

            ju, jv, _ = _pcg3d(pix_u, s_u, jnp.uint32(0))
            u = (pcol_f + _u01(ju)) / inv_w1
            v = (prow_f + _u01(jv)) / inv_h1

            dx = llcx + u * hx + v * vx - ox0
            dy = llcy + u * hy + v * vy - oy0
            dz = llcz + u * hz + v * vz - oz0
            dlen = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            dx, dy, dz = dx / dlen, dy / dlen, dz / dlen

            ox = jnp.broadcast_to(ox0, (R, LANES))
            oy = jnp.broadcast_to(oy0, (R, LANES))
            oz = jnp.broadcast_to(oz0, (R, LANES))

            tpr = one
            tpg = one
            tpb = one
            rr = zero
            rg = zero
            rb = zero
            alive_f = jnp.where(active0, 1.0, 0.0)

            # bounce loop as a while with ONLY f32-vector + i32-scalar
            # carries (Mosaic can't legalize scf.for/while with f32-scalar
            # or i1-vector carries, and a static unroll at depth 8 explodes
            # compile time).  The while predicate adds dead-wavefront early
    # exit: once every lane has terminated, remaining bounces are skipped
            # (big win for sky-heavy scenes).
            def bounce_cond(st):
                b = st[0]
                alive_f = st[13]
                return (b < depth) & (jnp.sum(alive_f) > 0.0)

            def bounce_body(st):
                (b, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb,
                 rr, rg, rb, alive_f, seg) = st
                alive = alive_f > 0.5
                seg = seg + alive_f

                # ---- closest hit over spheres (common.rs:60-98) ----------
                hs0 = (jnp.full((R, LANES), BIG),
                       zero, zero, one,            # winning center (nx..nz)
                       zero, zero, zero, zero,     # kind, ar, ag, ab
                       zero, one)                  # fz, irx
                if lowp:
                    hs = _sphere_loop_lowp(sph_ref, n_spheres,
                                           ox, oy, oz, dx, dy, dz, hs0)
                else:
                    hs = _sphere_loop(sph_ref, sphc_b_ref, sphc_r_ref,
                                      n_spheres, n_sph_clusters,
                                      ox, oy, oz, dx, dy, dz, alive, hs0)
                hs, (hpx, hpy, hpz) = _sphere_normals(
                    ox, oy, oz, dx, dy, dz, hs)

                # ---- triangles (common.rs:124-166 via edge constants) ----
                if n_tris > 0:
                    if tri_stream:
                        ivx, ivy, ivz = _safe_inv_dir(dx, dy, dz)
                        hs = _streamed_tri_walk(
                            hs, tri_hbm=tri_hbm, tri_smem=tri_smem,
                            dma_sem=dma_sem, tric_b_ref=tric_b_ref,
                            tric_r_ref=tric_r_ref, trit_b_ref=trit_b_ref,
                            trit_r_ref=trit_r_ref, n_tri_tops=n_tri_tops,
                            make_body=lambda read, ci: _make_tri_body(
                                read, parity_plane_sign,
                                ox, oy, oz, dx, dy, dz),
                            ox=ox, oy=oy, oz=oz, ivx=ivx, ivy=ivy,
                            ivz=ivz, alive=alive)
                    else:
                        tri_body = _make_tri_body(
                            lambda row, ti: tri_ref[row, ti],
                            parity_plane_sign, ox, oy, oz, dx, dy, dz)
                        if n_tri_clusters > 0:
                            ivx, ivy, ivz = _safe_inv_dir(dx, dy, dz)

                            def tri_cluster_body(ci, hs):
                                t_best = hs[0]
                                possible = _aabb_test(
                                    tric_b_ref, ci, ox, oy, oz, ivx, ivy,
                                    ivz, t_best, alive)
                                any_p = jnp.max(
                                    jnp.where(possible, 1.0, 0.0))
                                s0 = jnp.where(any_p > 0.0,
                                               tric_r_ref[0, ci], 0)
                                s1 = jnp.where(any_p > 0.0,
                                               tric_r_ref[1, ci], 0)
                                return jax.lax.fori_loop(s0, s1, tri_body,
                                                         hs)

                            hs = jax.lax.fori_loop(0, n_tri_clusters,
                                                   tri_cluster_body, hs)
                        else:
                            hs = jax.lax.fori_loop(0, n_tris, tri_body, hs)
                    hs = _resolve_tri_normals(hs)
                    t_best = hs[0]
                    hpx = ox + t_best * dx
                    hpy = oy + t_best * dy
                    hpz = oz + t_best * dz

                # ---- RNG draw + scatter + bookkeeping --------------------
                (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb,
                 alive_f, seg) = _scatter_bookkeep(
                    pix_u, s_u, b, ox, oy, oz, dx, dy, dz, hpx, hpy, hpz,
                    hs, tpr, tpg, tpb, rr, rg, rb, alive, seg)
                return (b + 1, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb,
                        rr, rg, rb, alive_f, seg)

            st = (jnp.int32(0), ox, oy, oz, dx, dy, dz, tpr, tpg, tpb,
                  rr, rg, rb, alive_f, seg)
            st = jax.lax.while_loop(bounce_cond, bounce_body, st)
            rr, rg, rb, seg = st[10], st[11], st[12], st[14]
            return (acc_r + rr, acc_g + rg, acc_b + rb, seg)

        acc_r, acc_g, acc_b, seg = jax.lax.fori_loop(
            0, spp, trace_sample, (zero, zero, zero, zero))

        inv_spp = jnp.float32(1.0 / spp)
        out_ref[0] = acc_r * inv_spp
        out_ref[1] = acc_g * inv_spp
        out_ref[2] = acc_b * inv_spp
        out_ref[3] = seg           # per-lane traced-segment count

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "samples_per_pixel", "depth",
                     "block_rows", "parity_plane_sign", "count_all_lanes",
                     "interpret", "shard_rows", "lowp", "stream_tops"))
def render_linear_pallas(sph_table, tri_table, cam_vec, *, width, height,
                         samples_per_pixel, depth, seed=0, block_rows=32,
                         parity_plane_sign=True, count_all_lanes=False,
                         interpret=False, sph_clusters=None,
                         tri_clusters=None, shard_rows=None, row_offset=0,
                         row_stride=1, lowp=False, tri_stream=None,
                         stream_tops=0):
    """Mean linear radiance [rows, W, 3] + segment count, fused kernel.

    sph_table: (SPH_ROWS, S) from pack_spheres; tri_table: (TRI_ROWS, T)
    from pack_triangles; cam_vec: (12,) f32 [origin, llc, horizontal,
    vertical].  sph_clusters/tri_clusters: optional (bounds (4, C) f32,
    ranges (2, C) i32) from cluster_spheres/cluster_triangles — the TABLES
    MUST then be packed with the matching perm; enables block-level culling.

    shard_rows/row_offset/row_stride render a ROW SUBSET of the full image:
    ``shard_rows`` (static; default = height) rows at global rows
    ``row_offset + k * row_stride`` (both traced, so a shard_map body can
    pass ``axis_index`` / the device count).  Pixel ids — and therefore RNG
    streams and every per-lane float — depend only on global (row, col), so
    any banded or interleaved render is bitwise identical to the matching
    rows of a whole-image render.  stride = n_devices round-robins rows
    across the mesh, load-balancing sky-heavy vs bounce-heavy image regions
    (measured 0.68 -> >0.97 balance on the default world).

    block_rows=32 (a 32x128-pixel tile) measured fastest across scene
    sizes on v5e: tiles small enough that sky-heavy blocks retire bounces
    early and frustums stay tight for cluster culling, large enough to
    amortize per-block setup.

    tri_clusters requires parity_plane_sign=False: the reference's
    wrong-sign plane equation (common.rs:140-141) registers hits at t values
    unrelated to triangle geometry for origins != 0, so vertex-derived
    bounds cannot contain them.
    """
    if tri_clusters is not None and parity_plane_sign:
        raise ValueError(
            "tri_clusters culling is unsound with parity_plane_sign=True "
            "(bounce-ray hits escape vertex-derived bounds)")
    if shard_rows is None:
        shard_rows = height
    ntx = pl.cdiv(width, LANES)
    nty = pl.cdiv(shard_rows, block_rows)
    nblocks = ntx * nty
    rows_total = nblocks * block_rows
    n_spheres = sph_table.shape[1]
    n_tris = tri_table.shape[1]

    if sph_clusters is None:
        sphc_b = jnp.zeros((6, 1), jnp.float32)
        sphc_r = jnp.zeros((2, 1), jnp.int32)
        n_sph_clusters = 0
    else:
        sphc_b, sphc_r = sph_clusters
        n_sph_clusters = sphc_b.shape[1]
    if tri_clusters is None:
        tric_b = jnp.zeros((6, 1), jnp.float32)
        tric_r = jnp.zeros((2, 1), jnp.int32)
        n_tri_clusters = 0
    else:
        tric_b, tric_r = tri_clusters
        n_tri_clusters = tric_b.shape[1]

    kernel = _make_kernel(width, height, samples_per_pixel, depth,
                          n_spheres, n_tris, block_rows, parity_plane_sign,
                          count_all_lanes, n_sph_clusters, n_tri_clusters,
                          shard_rows=shard_rows, lowp=lowp,
                          tri_stream=stream_tops > 0,
                          n_tri_tops=stream_tops)

    seed_arr = jnp.stack([
        jnp.uint32(seed) * _SEED_MIX,
        jnp.asarray(row_offset, jnp.int32).astype(jnp.uint32),
        jnp.asarray(row_stride, jnp.int32).astype(jnp.uint32)])

    if stream_tops > 0:
        # streamed triangles: tri_table is the leaf-aligned HBM-resident
        # table (ops.diff.tri_stream_table_jnp), tri_clusters the leaf
        # AABBs + packed ranges, tri_stream the top-level (bounds, ranges)
        trit_b, trit_r = tri_stream
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((4, block_rows, LANES),
                                   lambda i, *prefetch: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((STREAM_ROWS_PAD, STREAM_LEAF_PAD),
                           jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        img = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((4, rows_total, LANES),
                                           jnp.float32),
            interpret=interpret,
        )(cam_vec, sph_table, sphc_b, sphc_r, tric_b, tric_r,
          trit_b, trit_r, seed_arr, tri_table)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(nblocks,),
            in_specs=[],
            out_specs=pl.BlockSpec((4, block_rows, LANES),
                                   lambda i, *prefetch: (0, i, 0),
                                   memory_space=pltpu.VMEM),
        )
        img = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((4, rows_total, LANES),
                                           jnp.float32),
            interpret=interpret,
        )(cam_vec, sph_table, sphc_b, sphc_r, tri_table, tric_b, tric_r,
          seed_arr)

    # un-tile: blocks are (block_rows x LANES) image tiles in row-major
    # (ty, tx) order
    tiles = img.reshape(4, nty, ntx, block_rows, LANES)
    planes = tiles.transpose(0, 1, 3, 2, 4).reshape(
        4, nty * block_rows, ntx * LANES)[:, :shard_rows, :width]
    mean = jnp.moveaxis(planes[:3], 0, -1)
    # per-lane counts are small ints (<= spp*depth, exact in f32); the sum
    # may round a few ulp at very large configs — fine for rays/s accounting
    return mean, jnp.sum(tiles[3])


def camera_vec(camera: Camera) -> jax.Array:
    return jnp.concatenate([
        camera.origin, camera.lower_left_corner,
        camera.horizontal, camera.vertical]).astype(jnp.float32)
