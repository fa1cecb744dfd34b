"""Sorted-compaction renderer: per-bounce kernel + ray reordering.

The fused kernels (wavefront.py, wavefront_stream.py) keep the bounce loop
INSIDE one Pallas launch, so a block's 4096 lanes stay pinned to their
pixels for the whole trace.  That is ideal while the wavefront is coherent
(primary rays = a tight frustum per image tile) but collapses on divergent
diffuse secondaries: the block-granularity bound tests pass for almost
every leaf once a block's rays point everywhere, and the 164k-tri scene
drops to ~1 Mray/s at depth 4 (PERFSTUDY r2, VERDICT r2 item 1).

This module restructures the trace the TPU-native way instead of chasing
per-lane traversal the VPU cannot do:

  * ONE BOUNCE PER LAUNCH — the bounce loop runs in XLA, carrying a flat
    SoA ray-state batch (13 f32 planes + 2 uint32 id planes) through the
    kernel;
  * SORT BETWEEN BOUNCES — surviving rays are reordered by a
    [coarse cell | direction class | fine cell] key (_sort_keys), so
    every (block_rows x 128)-lane block the next bounce sees is a tight
    position-AND-direction packet and the same conservative bound tests
    cull like they do on primaries.  Dead rays sort to the end, where
    all-dead blocks exit the walk immediately;
  * PRIMARY RAYS IN MORTON PIXEL ORDER — bounce 0's blocks are square
    image tiles (not row stripes), with the camera-sorted front-to-back
    walk + early exit of the streamed kernel;
  * FRONT-TO-BACK SECONDARIES — per-reference-point visit orders +
    conservative key adjustment (node_orders/node_keys/dmax) give
    divergent bounces the same early exit, and each ray's culling bound
    is capped at its ROOT-sphere exit distance so miss-rays cannot pin
    a walk open;
  * RUN-LEVEL WALK — one union-bound test gates 8 ordered top visits
    (the per-block walk floor shrinks ~8x); a passing top's 1024 columns
    arrive in ONE DMA;
  * 32-TRIANGLE SUB-LEAVES — the HBM table is laid out as 128-column
    groups of four 32-triangle sub-leaves, each with its own bounding
    sphere in SMEM: culling granularity shrinks 4x while DMA slices stay
    (8,128)-tile aligned.

Physics is shared with wavefront.py (_sphere_loop/_make_tri_body/
_scatter_bookkeep) and the RNG streams are the same pcg3d counters keyed
on (pixel, sample, bounce), so the image agrees with the other engines to
float rounding regardless of ray order.  Reference semantics:
common.rs:263-285 (bounce rules), common.rs:124-166 (triangle test,
correct-sign plane equation only — same soundness rule as all culling).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene import Scene
from .wavefront import (
    LANES, TRI_ROWS, BIG, T_MIN, _SEED_MIX, _BOUND_PAD,
    _bound_test, _make_tri_body, _pcg3d, _scatter_bookkeep,
    _sphere_loop, _sphere_normals, _resolve_tri_normals,
    _median_split_order, pack_triangles,
)
from .wavefront_stream import TRI_ROWS_PAD, sorted_top_order

SUB = 32          # triangles per sub-leaf (cull granularity)
GROUP_SUBS = 4    # sub-leaves per 128-column group
GROUP = SUB * GROUP_SUBS   # = LANES: one lane-aligned column block
TOP_GROUPS = 8    # groups per top node (1024 columns)
# One DMA per PASSING TOP (1024 columns, ~96 KB) instead of per group:
# start/wait latency amortizes 8x, and the group/sub-leaf bound tests then
# run against SMEM-resident data
TOP_SPAN = TOP_GROUPS * GROUP
RUN = 8           # walk-order entries per RUN (one run-level bound test
                  # gates 8 top visits — cuts the per-block walk floor)
REF_TOPS = 4      # top nodes per secondary-exit reference point

# ray-state plane indices (f32 planes carried between bounces)
(_ST_OX, _ST_OY, _ST_OZ, _ST_DX, _ST_DY, _ST_DZ,
 _ST_TPR, _ST_TPG, _ST_TPB, _ST_RR, _ST_RG, _ST_RB, _ST_ALIVE) = range(13)
STATE_PLANES = 13


# ---------------------------------------------------------------------------
# Host-side tables
# ---------------------------------------------------------------------------

def _bounding_sphere(points: np.ndarray):
    bc = (points.min(axis=0) + points.max(axis=0)) * 0.5
    br = float(np.max(np.linalg.norm(points - bc, axis=-1)))
    return bc, br * _BOUND_PAD + 1e-4


def _aabb_of(points: np.ndarray):
    """Conservatively padded f32 axis-aligned bounding box of ``points``."""
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    pad = 1e-4 + 1e-5 * np.maximum(np.abs(lo), np.abs(hi))
    return ((lo - pad).astype(np.float32), (hi + pad).astype(np.float32))


def _aabb_union(aabb: np.ndarray, members) -> tuple:
    """Union of child AABB columns (aabb is (6, M): lo rows 0-2, hi 3-5)."""
    lo = aabb[0:3, members].min(axis=1)
    hi = aabb[3:6, members].max(axis=1)
    return lo.astype(np.float32), hi.astype(np.float32)


def build_tri_sorted_tables(scene: Scene):
    """Sub-leaf-aligned triangle table + 3-level bounds + sort-key box.

    Returns (tri_hbm (TRI_ROWS_PAD, L*SUB) f32, sub_bounds (4, L) f32,
    sub_counts (1, L) i32, grp_bounds (4, G) f32, top_bounds (4, C) f32,
    top_ranges (2, C) i32 [group ranges], root (4, 1) f32,
    ref_pts (4, NR) f32, node_orders (NR, C) i32, node_keys (NR, C) f32,
    node_run_bounds (4, NR*R8) f32, key_lo (3,) f32, key_hi (3,) f32,
    sub_aabb (6, L) f32, grp_aabb (6, G) f32, top_aabb (6, C) f32)
    where NR = ceil(C / REF_TOPS) reference points and R8 = ceil(C / RUN).
    The AABB rows are [lox, loy, loz, hix, hiy, hiz] (empty nodes get
    lo > hi so every slab test misses); the binned engine culls with them
    (2-3x tighter than bounding spheres on flat surface patches), the
    sphere rows keep driving visit ORDER and exit KEYS.

    Sub-leaves are median-split spatial clusters of <= 32 valid triangles
    in DFS order, padded to 32 columns with never-hit zeros; L is padded to
    a GROUP_SUBS multiple so DMA group g always covers sub-leaves
    [4g, 4g+4).  key_lo/key_hi is the triangle bounding box expanded 25%
    per side — the quantization box for the inter-bounce Morton sort keys
    (origins outside clamp to boundary cells, which still separates them
    in the unclamped axes).

    node_orders/node_keys drive the SECONDARY-bounce front-to-back early
    exit: row i is the top-node visit order from reference point p_i (the
    centroid of REF_TOPS consecutive DFS tops), with keys[i, j] =
    dist(p_i, c_j) - r_j — for a ray whose origin o satisfies
    dist(o, p_i) <= dmax, its entry distance into node j is
    >= keys[i, j] - dmax, so a block can stop its walk once every
    relevant lane's closest hit beats that adjusted bound (the kernel
    picks i nearest its live-origin centroid and computes dmax as a lane
    reduction).  node_run_bounds[:, i*R8 + k] is the union bounding
    sphere of order row i's entries [k*RUN, (k+1)*RUN) — one conservative
    run test gates 8 visits.
    """
    v0 = np.asarray(scene.tri_v0, np.float64)
    v1 = np.asarray(scene.tri_v1, np.float64)
    v2 = np.asarray(scene.tri_v2, np.float64)
    valid = np.asarray(scene.tri_valid)
    vidx = np.nonzero(valid)[0]
    cen = (v0 + v1 + v2) / 3.0
    perm_v, slices = _median_split_order(cen[vidx], SUB)
    perm_valid = vidx[perm_v]
    n_sub = max(len(slices), 1)
    # pad to a full TOP span so the per-top DMA never reads past the table
    L = -(-n_sub // (GROUP_SUBS * TOP_GROUPS)) * (GROUP_SUBS * TOP_GROUPS)
    G = L // GROUP_SUBS
    C = max(G // TOP_GROUPS, 1)

    packed = pack_triangles(scene, perm=np.concatenate(
        [perm_valid, np.nonzero(~valid)[0]]).astype(np.int64))
    tri_hbm = np.zeros((TRI_ROWS_PAD, L * SUB), np.float32)
    sub_bounds = np.zeros((4, L), np.float32)
    sub_bounds[3] = -1.0
    sub_counts = np.zeros((1, L), np.int32)
    sub_verts = [None] * L
    # AABBs: empty nodes get lo=+1 > hi=-1 so the slab test always misses
    sub_aabb = np.zeros((6, L), np.float32)
    sub_aabb[0:3] = 1.0
    sub_aabb[3:6] = -1.0
    for k, (s, e) in enumerate(slices or [(0, 0)]):
        n = e - s
        tri_hbm[:TRI_ROWS, k * SUB:k * SUB + n] = packed[:, s:e]
        sub_counts[0, k] = n
        if n == 0:
            continue
        mem = perm_valid[s:e]
        verts = np.concatenate([v0[mem], v1[mem], v2[mem]], axis=0)
        sub_verts[k] = verts
        bc, br = _bounding_sphere(verts)
        sub_bounds[0:3, k] = bc
        sub_bounds[3, k] = br * br
        sub_aabb[0:3, k], sub_aabb[3:6, k] = _aabb_of(verts)

    def union_bound(child_bounds, members):
        """Bounding sphere of a set of child bounding spheres."""
        cs = child_bounds[0:3, members]
        bc = (cs.min(axis=1) + cs.max(axis=1)) * 0.5
        br = 0.0
        for m in members:
            d = float(np.linalg.norm(child_bounds[0:3, m] - bc))
            br = max(br, d + float(np.sqrt(child_bounds[3, m])))
        return bc, br * _BOUND_PAD + 1e-4

    grp_bounds = np.zeros((4, G), np.float32)
    grp_bounds[3] = -1.0
    grp_aabb = np.zeros((6, G), np.float32)
    grp_aabb[0:3] = 1.0
    grp_aabb[3:6] = -1.0
    for g in range(G):
        members = [m for m in range(g * GROUP_SUBS, (g + 1) * GROUP_SUBS)
                   if sub_counts[0, m] > 0]
        if not members:
            continue
        bc, br = union_bound(sub_bounds, members)
        grp_bounds[0:3, g] = bc
        grp_bounds[3, g] = br * br
        grp_aabb[0:3, g], grp_aabb[3:6, g] = _aabb_union(sub_aabb, members)

    top_bounds = np.zeros((4, C), np.float32)
    top_bounds[3] = -1.0
    top_ranges = np.zeros((2, C), np.int32)
    top_aabb = np.zeros((6, C), np.float32)
    top_aabb[0:3] = 1.0
    top_aabb[3:6] = -1.0
    for c in range(C):
        g0, g1 = c * TOP_GROUPS, min((c + 1) * TOP_GROUPS, G)
        top_ranges[0, c], top_ranges[1, c] = g0, g1
        members = [m for m in range(g0, g1) if grp_bounds[3, m] > 0]
        if not members:
            continue
        bc, br = union_bound(grp_bounds, members)
        top_bounds[0:3, c] = bc
        top_bounds[3, c] = br * br
        top_aabb[0:3, c], top_aabb[3:6, c] = _aabb_union(grp_aabb, members)

    root = np.zeros((4, 1), np.float32)
    root[3] = -1.0
    live = [m for m in range(G) if grp_bounds[3, m] > 0]
    if live:
        bc, br = union_bound(grp_bounds, live)
        root[0:3, 0] = bc
        root[3, 0] = br * br

    centers = top_bounds[0:3]                    # (3, C)
    rads = np.sqrt(np.maximum(top_bounds[3], 0.0))
    valid_top = top_bounds[3] > 0.0
    NR = -(-C // REF_TOPS)
    R8 = -(-C // RUN)
    ref_pts = np.zeros((4, NR), np.float32)
    node_orders = np.zeros((NR, C), np.int32)
    node_keys = np.zeros((NR, C), np.float32)
    node_run_bounds = np.zeros((4, NR * R8), np.float32)
    node_run_bounds[3] = -1.0
    for i in range(NR):
        members = [m for m in range(i * REF_TOPS,
                                    min((i + 1) * REF_TOPS, C))
                   if valid_top[m]]
        p = (centers[:, members].mean(axis=1) if members
             else centers[:, min(i * REF_TOPS, C - 1)])
        ref_pts[0:3, i] = p
        ref_pts[3, i] = 1.0 if members else -1.0
        d = np.linalg.norm(centers.T - p, axis=1)
        keys = np.where(valid_top, d - rads, np.inf)
        order = np.argsort(keys, kind="stable").astype(np.int32)
        node_orders[i] = order
        node_keys[i] = keys[order].astype(np.float32)
        for k in range(R8):
            run = [int(j) for j in order[k * RUN:(k + 1) * RUN]
                   if valid_top[j]]
            if not run:
                continue
            bc, br = union_bound(top_bounds, run)
            node_run_bounds[0:3, i * R8 + k] = bc
            node_run_bounds[3, i * R8 + k] = br * br

    if len(vidx):
        verts = np.concatenate(
            [v0[vidx], v1[vidx], v2[vidx]], axis=0)
        lo = verts.min(axis=0)
        hi = verts.max(axis=0)
        pad = 0.25 * np.maximum(hi - lo, 1e-3)
        key_lo = (lo - pad).astype(np.float32)
        key_hi = (hi + pad).astype(np.float32)
    else:
        key_lo = np.full(3, -1.0, np.float32)
        key_hi = np.full(3, 1.0, np.float32)
    return (tri_hbm, sub_bounds, sub_counts, grp_bounds, top_bounds,
            top_ranges, root, ref_pts, node_orders, node_keys,
            node_run_bounds, key_lo, key_hi, sub_aabb, grp_aabb, top_aabb)


# ---------------------------------------------------------------------------
# Morton helpers (jnp, used both for primary pixel order and sort keys)
# ---------------------------------------------------------------------------

def _part1by2(x):
    """Spread the low 10 bits of x over every 3rd bit (3D Morton)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _compact1by1(x):
    """Extract the even bits of x (inverse of 2D Morton interleave)."""
    x = x & 0x55555555
    x = (x | (x >> 1)) & 0x33333333
    x = (x | (x >> 2)) & 0x0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF
    return x


def _run_bounds_jnp(top_bounds, order):
    """Union bounding spheres of RUN-length slices of a visit order —
    traceable twin of the builder's node_run_bounds, for the per-camera
    order computed at dispatch time.  Returns (4, R8) f32 (row 3 = r^2,
    -1 for empty runs)."""
    C = top_bounds.shape[1]
    R8 = -(-C // RUN)
    pad = R8 * RUN - C
    idx = order[0]
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), jnp.int32)])
    c = top_bounds[0:3, :].T[idx].reshape(R8, RUN, 3)
    r2 = top_bounds[3, :][idx].reshape(R8, RUN)
    valid = (r2 > 0.0) & (jnp.arange(R8 * RUN).reshape(R8, RUN) < C)
    r = jnp.sqrt(jnp.maximum(r2, 0.0))
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(valid[..., None], c, big), axis=1)
    hi = jnp.max(jnp.where(valid[..., None], c, -big), axis=1)
    ctr = (lo + hi) * 0.5
    rad = jnp.max(jnp.where(
        valid, jnp.linalg.norm(c - ctr[:, None, :], axis=-1) + r, -1.0),
        axis=1)
    any_v = jnp.any(valid, axis=1)
    rad = rad * jnp.float32(_BOUND_PAD) + 1e-4
    row3 = jnp.where(any_v, rad * rad, -1.0)
    return jnp.concatenate([ctr.T, row3[None, :]]).astype(jnp.float32)


def _u01_jnp(bits):
    """XLA-side twin of wavefront._u01 — identical bits, identical float."""
    b24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
    i = jax.lax.bitcast_convert_type(b24, jnp.int32)
    return i.astype(jnp.float32) * jnp.float32(1.0 / 16777215.0)


def _sort_keys(state, key_lo, key_hi):
    """Coherence keys for the inter-bounce sort: DIRECTION-major
    (quantized direction class, then Morton(origin)); dead rays get
    +inf-like keys and sink to the end.

    Key layout [coarse position | direction | fine position], measured on
    the 164k-tri scene (PERFSTUDY "sorted" study): a block's triangle
    work is the union of its rays' candidate sub-leaves.  Pure
    position-major blocks mix all directions from a few cells (hemisphere
    unions — ~6.9k tri tests/block at bounce 1); pure direction-major
    destroys origin locality for surface-to-surface bounces (bounce 2-3
    unions 2x worse).  Coarse cell first, then a ~45-degree direction
    class, then the fine cell keeps both: rays in a block share a
    half-radius neighborhood AND a cone.
    """
    ox, oy, oz = state[_ST_OX], state[_ST_OY], state[_ST_OZ]
    dx, dy, dz = state[_ST_DX], state[_ST_DY], state[_ST_DZ]
    alive = state[_ST_ALIVE] > 0.5
    span = jnp.maximum(key_hi - key_lo, 1e-6)

    def q(v, a):
        cell = (v - key_lo[a]) / span[a] * jnp.float32(128.0)
        return jnp.clip(cell, 0.0, 127.0).astype(jnp.int32)

    mort = ((_part1by2(q(ox, 0)) << 2) | (_part1by2(q(oy, 1)) << 1)
            | _part1by2(q(oz, 2)))

    def qd(v):
        # direction component in [-1, 1] -> 2-bit class
        return jnp.clip((v + 1.0) * 2.0, 0.0, 3.0).astype(jnp.int32)

    dir6 = (qd(dx) << 4) | (qd(dy) << 2) | qd(dz)
    key = (((mort >> 12) << 18) | (dir6 << 12) | (mort & 0xFFF))
    return jnp.where(alive, key, jnp.int32(0x7FFFFFFF))


# ---------------------------------------------------------------------------
# The per-bounce kernel
# ---------------------------------------------------------------------------

def _make_bounce_kernel(n_spheres, n_sph_clusters, n_tops, block_rows,
                        use_exit, node_exit, debug_counts=False):
    """One bounce for a (block_rows x 128)-ray block: sphere loop +
    sub-leaf streamed triangle walk + scatter.

    ``use_exit`` statically enables the camera-keyed front-to-back early
    exit (valid only when every live ray shares the origin the keys were
    sorted from — bounce 0).  ``node_exit`` enables the SECONDARY-bounce
    exit: the block picks the top node nearest its live-origin centroid
    as reference point i, walks in node_orders[i] order, and stops when
    every relevant lane's closest hit beats node_keys[i, j] - dmax
    (dmax = max live-origin distance to c_i — the conservative correction
    for origins not exactly at the reference point)."""
    R = block_rows

    def kernel(sph_ref, sphc_b_ref, sphc_r_ref, subb_ref, subn_ref,
               grpb_ref, topb_ref, topr_ref, order_ref, keys_ref,
               crunb_ref, refp_ref, norder_ref, nkeys_ref, nrunb_ref,
               root_ref, binfo_ref, state_ref, ids_ref, tri_hbm, out_ref,
               *rest):
        if debug_counts:
            cnt_ref, tri_smem, dma_sem = rest
        else:
            tri_smem, dma_sem = rest
        b = binfo_ref[0]
        ox = state_ref[_ST_OX]
        oy = state_ref[_ST_OY]
        oz = state_ref[_ST_OZ]
        dx = state_ref[_ST_DX]
        dy = state_ref[_ST_DY]
        dz = state_ref[_ST_DZ]
        tpr = state_ref[_ST_TPR]
        tpg = state_ref[_ST_TPG]
        tpb = state_ref[_ST_TPB]
        rr = state_ref[_ST_RR]
        rg = state_ref[_ST_RG]
        rb = state_ref[_ST_RB]
        alive_f = state_ref[_ST_ALIVE]
        alive = alive_f > 0.5
        pix_u = ids_ref[0]
        s_u = ids_ref[1]

        zero = jnp.zeros((R, LANES), jnp.float32)
        one = jnp.ones((R, LANES), jnp.float32)

        hs0 = (jnp.full((R, LANES), BIG),
               zero, zero, one,
               zero, zero, zero, zero,
               zero, one)
        hs = _sphere_loop(sph_ref, sphc_b_ref, sphc_r_ref, n_spheres,
                          n_sph_clusters, ox, oy, oz, dx, dy, dz, alive, hs0)
        hs, _ = _sphere_normals(ox, oy, oz, dx, dy, dz, hs)

        # NOTE: a row-grouped variant (sub-leaf tests + member loops per
        # (8,128) row group) was measured SLOWER despite ~40% fewer lane
        # tests — Mosaic's per-fori overhead exceeds the vector savings at
        # this granularity (PERFSTUDY "sorted" study) — so the triangle
        # loop runs at whole-block granularity.
        tri_body = _make_tri_body(lambda row, i: tri_smem[row, i], False,
                                  ox, oy, oz, dx, dy, dz)
        # Root test with an EXIT-DISTANCE cap: every triangle lies inside
        # the root sphere, so a ray that entered it cannot hit one past
        # the point where it leaves — min(t_best, t_cap) is therefore a
        # sound culling bound.  Lanes missing the root get t_cap = -BIG,
        # which fails every entry<=t test AND stops them from pinning the
        # front-to-back walk open at t_best = BIG (the round-2 failure
        # mode: root-passing miss-rays forced full walks).
        rcx = root_ref[0, 0]
        rcy = root_ref[1, 0]
        rcz = root_ref[2, 0]
        rr2 = root_ref[3, 0]
        ocx = ox - rcx
        ocy = oy - rcy
        ocz = oz - rcz
        rhb = ocx * dx + ocy * dy + ocz * dz
        rcc = ocx * ocx + ocy * ocy + ocz * ocz - rr2
        rdisc = rhb * rhb - rcc
        rsq = jnp.sqrt(jnp.maximum(rdisc, 0.0))
        rexit = -rhb + rsq
        root_p = (rdisc >= 0.0) & (rexit > T_MIN) & alive & (rr2 > 0.0)
        t_cap = jnp.where(root_p, rexit * jnp.float32(1.0005) + 1e-4,
                          -BIG)

        def cull_t(t_best):
            return jnp.minimum(t_best, t_cap)

        if node_exit:
            # reference point = the one nearest the live-origin centroid
            n_refs = refp_ref.shape[1]
            live_cnt = jnp.maximum(jnp.sum(alive_f), 1.0)
            ccx = jnp.sum(ox * alive_f) / live_cnt
            ccy = jnp.sum(oy * alive_f) / live_cnt
            ccz = jnp.sum(oz * alive_f) / live_cnt

            def near_body(i, carry):
                best_d2, best_i = carry
                ddx = refp_ref[0, i] - ccx
                ddy = refp_ref[1, i] - ccy
                ddz = refp_ref[2, i] - ccz
                d2 = ddx * ddx + ddy * ddy + ddz * ddz
                d2 = jnp.where(refp_ref[3, i] > 0.0, d2, jnp.float32(3e38))
                better = d2 < best_d2
                return (jnp.where(better, d2, best_d2),
                        jnp.where(better, i, best_i))

            _, ref_i = jax.lax.fori_loop(
                0, n_refs, near_body, (jnp.float32(3e38), jnp.int32(0)))
            rdx = ox - refp_ref[0, ref_i]
            rdy = oy - refp_ref[1, ref_i]
            rdz = oz - refp_ref[2, ref_i]
            d2o = rdx * rdx + rdy * rdy + rdz * rdz
            dmax = jnp.sqrt(jnp.max(jnp.where(alive, d2o, 0.0)))

        def make_grp_body(g0r):
            def grp_body(g, carry):
                c_grp, c_sub, c_tri = carry[0], carry[1], carry[2]
                hs = carry[3:]
                possible = _bound_test(grpb_ref, g, ox, oy, oz, dx, dy,
                                       dz, cull_t(hs[0]), alive)
                any_g = jnp.max(jnp.where(possible, 1.0, 0.0))
                c_grp = c_grp + (any_g > 0.0).astype(jnp.int32)
                base = (g - g0r) * GROUP

                def sub_body(k, carry2):
                    c_sub, c_tri = carry2[0], carry2[1]
                    hs = carry2[2:]
                    li = g * GROUP_SUBS + k
                    psub = _bound_test(subb_ref, li, ox, oy, oz, dx, dy,
                                       dz, cull_t(hs[0]), alive)
                    any_s = jnp.max(jnp.where(psub, 1.0, 0.0))
                    n = jnp.where((any_s > 0.0) & (any_g > 0.0),
                                  subn_ref[0, li], 0)
                    c_sub = c_sub + (n > 0).astype(jnp.int32)
                    c_tri = c_tri + n
                    off = base + k * SUB
                    hs = jax.lax.fori_loop(off, off + n, tri_body, hs)
                    return (c_sub, c_tri) + hs

                out = jax.lax.fori_loop(0, GROUP_SUBS, sub_body,
                                        (c_sub, c_tri) + hs)
                return (c_grp,) + out
            return grp_body

        # ---- two-level walk: RUN-level bound gates 8 ordered visits ----
        R8 = -(-n_tops // RUN)

        def walk_cond(wst):
            ri, hs = wst[0], wst[5:]
            relevant_t = cull_t(hs[0])
            ki = jnp.minimum(ri * RUN, n_tops - 1)
            if use_exit:
                # >= keeps entry-bound ties walking so exact-tie closest
                # hits resolve like the full walk (wavefront_stream.py);
                # keys are sorted, so the run's FIRST key lower-bounds it
                return ((ri < R8)
                        & (jnp.max(relevant_t) >= keys_ref[0, ki]))
            if node_exit:
                exit_key = nkeys_ref[ref_i, ki] - dmax
                return ((ri < R8)
                        & (jnp.max(relevant_t) >= exit_key))
            return ((ri < R8)
                    & (jnp.max(relevant_t) >= jnp.float32(-1.0)))

        def visit_body(oi, carry):
            c_top = carry[0]
            counters = carry[1:4]
            hs = carry[4:]
            if node_exit and not use_exit:
                ci = norder_ref[ref_i, oi]
            else:
                ci = order_ref[0, oi]
            possible = _bound_test(topb_ref, ci, ox, oy, oz, dx, dy, dz,
                                   cull_t(hs[0]), alive)
            any_p = jnp.max(jnp.where(possible, 1.0, 0.0))
            c_top = c_top + (any_p > 0.0).astype(jnp.int32)
            g0r = topr_ref[0, ci]

            @pl.when(any_p > 0.0)
            def _():
                dma = pltpu.make_async_copy(
                    tri_hbm.at[:, pl.ds(g0r * GROUP, TOP_SPAN)],
                    tri_smem, dma_sem)
                dma.start()
                dma.wait()

            g0 = jnp.where(any_p > 0.0, g0r, 0)
            g1 = jnp.where(any_p > 0.0, topr_ref[1, ci], 0)
            out = jax.lax.fori_loop(g0, g1, make_grp_body(g0r),
                                    counters + hs)
            return (c_top,) + out

        def walk_body(wst):
            ri = wst[0]
            carry = wst[1:]
            if use_exit:
                run_p = _bound_test(crunb_ref, ri, ox, oy, oz, dx, dy, dz,
                                    cull_t(carry[4]), alive)
                any_r = jnp.max(jnp.where(run_p, 1.0, 0.0)) > 0.0
            elif node_exit:
                run_p = _bound_test(nrunb_ref, ref_i * R8 + ri,
                                    ox, oy, oz, dx, dy, dz,
                                    cull_t(carry[4]), alive)
                any_r = jnp.max(jnp.where(run_p, 1.0, 0.0)) > 0.0
            else:
                any_r = True
            lo = ri * RUN
            hi = jnp.where(any_r, jnp.minimum(lo + RUN, n_tops), lo)
            carry = jax.lax.fori_loop(lo, hi, visit_body, carry)
            return (ri + 1,) + carry

        zi = jnp.int32(0)
        wst = jax.lax.while_loop(walk_cond, walk_body,
                                 (zi, zi, zi, zi, zi) + hs)
        if debug_counts:
            # broadcast scalars into planes: TPU block specs need
            # (8, 128)-aligned tiles even for tiny outputs
            for q in range(5):
                cnt_ref[q] = jnp.broadcast_to(wst[q], (R, LANES))
            for q in range(5, 8):
                cnt_ref[q] = jnp.zeros((R, LANES), jnp.int32)
            # planes: 0 runs visited, 1 tops passed, 2 groups passed,
            # 3 sub-leaves passed, 4 triangle tests
        hs = _resolve_tri_normals(wst[5:])
        t_best = hs[0]
        hpx = ox + t_best * dx
        hpy = oy + t_best * dy
        hpz = oz + t_best * dz

        (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb,
         alive_f, _seg) = _scatter_bookkeep(
            pix_u, s_u, b, ox, oy, oz, dx, dy, dz, hpx, hpy, hpz,
            hs, tpr, tpg, tpb, rr, rg, rb, alive, zero)

        out_ref[_ST_OX] = ox
        out_ref[_ST_OY] = oy
        out_ref[_ST_OZ] = oz
        out_ref[_ST_DX] = dx
        out_ref[_ST_DY] = dy
        out_ref[_ST_DZ] = dz
        out_ref[_ST_TPR] = tpr
        out_ref[_ST_TPG] = tpg
        out_ref[_ST_TPB] = tpb
        out_ref[_ST_RR] = rr
        out_ref[_ST_RG] = rg
        out_ref[_ST_RB] = rb
        out_ref[_ST_ALIVE] = alive_f

    return kernel


def _bounce_call(state3, ids3, b, tables, *, block_rows, use_exit,
                 node_exit, interpret, debug_counts=False):
    """Launch one bounce over (STATE_PLANES, rows, LANES) state.  With
    ``debug_counts`` also returns per-block walk counters (nblocks, 5):
    [runs visited, tops passed, groups passed, sub-leaves passed,
    triangle tests] — the instrumentation behind the perf studies."""
    (sph, sphc_b, sphc_r, subb, subn, grpb, topb, topr, order, keys,
     crunb, refp, norder, nkeys, nrunb, root, tri_hbm) = tables
    rows = state3.shape[1]
    nblocks = rows // block_rows
    n_spheres = sph.shape[1]
    n_sph_clusters = 0 if sphc_b is None else sphc_b.shape[1]
    if sphc_b is None:
        sphc_b = jnp.zeros((6, 1), jnp.float32)
        sphc_r = jnp.zeros((2, 1), jnp.int32)
    n_tops = topb.shape[1]
    node_exit = node_exit and norder is not None
    if not node_exit:
        refp = jnp.zeros((4, 1), jnp.float32)
        norder = jnp.zeros((1, 1), jnp.int32)
        nkeys = jnp.zeros((1, 1), jnp.float32)
        nrunb = jnp.zeros((4, 1), jnp.float32)

    kernel = _make_bounce_kernel(n_spheres, n_sph_clusters, n_tops,
                                 block_rows, use_exit, node_exit,
                                 debug_counts=debug_counts)
    binfo = jnp.asarray(b, jnp.int32).reshape(1)
    state_spec = pl.BlockSpec((STATE_PLANES, block_rows, LANES),
                              lambda i, *prefetch: (0, i, 0),
                              memory_space=pltpu.VMEM)
    out_specs = state_spec
    out_shape = jax.ShapeDtypeStruct((STATE_PLANES, rows, LANES),
                                     jnp.float32)
    if debug_counts:
        out_specs = [state_spec,
                     pl.BlockSpec((8, block_rows, LANES),
                                  lambda i, *prefetch: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((8, rows, LANES), jnp.int32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=17,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((STATE_PLANES, block_rows, LANES),
                         lambda i, *prefetch: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_rows, LANES),
                         lambda i, *prefetch: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # tri table in HBM
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.SMEM((TRI_ROWS_PAD, TOP_SPAN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(sph, sphc_b, sphc_r, subb, subn, grpb, topb, topr, order, keys,
      crunb, refp, norder, nkeys, nrunb, root, binfo, state3, ids3,
      tri_hbm)


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "samples_per_pixel", "depth",
                     "block_rows", "interpret", "node_exit",
                     "debug_counts"))
def render_linear_pallas_sorted(sph_table, tri_hbm, sub_bounds, sub_counts,
                                grp_bounds, top_bounds, top_ranges,
                                root_bound, ref_pts, node_orders,
                                node_keys, node_run_bounds,
                                key_lo, key_hi, sub_aabb, grp_aabb,
                                top_aabb, cam_vec, *,
                                width, height, samples_per_pixel, depth,
                                seed=0, block_rows=16, interpret=False,
                                sph_clusters=None, top_order=None,
                                top_keys=None, node_exit=True,
                                debug_counts=False):
    """Mean linear radiance [H, W, 3] + segment count via the sorted
    per-bounce pipeline.  Table args come from pack_spheres +
    build_tri_sorted_tables; top_order/top_keys from
    ``sorted_top_order(top_bounds, camera.origin)`` drive the bounce-0
    front-to-back early exit, node_orders/node_keys the secondary-bounce
    one.  Always the CORRECT plane equation.

    block_rows=16 measured fastest on the 164k-tri depth-4 config
    (627 / 530 / 606 / 961 ms at 8 / 16 / 32 / 64): smaller blocks pay
    walk+DMA overhead per block, larger ones blow up the per-block
    candidate union the lockstep triangle loop must grind through."""
    spp = samples_per_pixel
    side = 1 << max(int(max(width, height)) - 1, 1).bit_length()
    npix_m = side * side
    block = block_rows * LANES
    N = -(-npix_m * spp // block) * block
    rows_total = N // LANES
    n_tops = top_bounds.shape[1]
    if top_order is None:
        top_order = jnp.arange(n_tops, dtype=jnp.int32).reshape(1, -1)
        top_keys = jnp.full((1, n_tops), -jnp.inf, jnp.float32)
    cam_run_bounds = _run_bounds_jnp(top_bounds, top_order)
    if sph_clusters is None:
        sphc_b = sphc_r = None
    else:
        sphc_b, sphc_r = sph_clusters

    # ---- primary rays, Morton pixel order ----
    ridx = jnp.arange(N, dtype=jnp.int32)
    m = ridx // spp
    s = ridx % spp
    col = _compact1by1(m)
    row = _compact1by1(m >> 1)
    active = (row < height) & (col < width) & (m < npix_m)
    rowc = jnp.minimum(row, height - 1)
    colc = jnp.minimum(col, width - 1)
    pix = rowc * width + colc
    seed_word = jnp.uint32(seed) * _SEED_MIX
    pix_u = pix.astype(jnp.uint32) + seed_word
    s_u = s.astype(jnp.uint32)

    ju, jv, _ = _pcg3d(pix_u, s_u, jnp.uint32(0))
    u = (colc.astype(jnp.float32) + _u01_jnp(ju)) / jnp.float32(width - 1)
    v = (rowc.astype(jnp.float32) + _u01_jnp(jv)) / jnp.float32(height - 1)
    o = cam_vec[0:3]
    dvx = cam_vec[3] + u * cam_vec[6] + v * cam_vec[9] - o[0]
    dvy = cam_vec[4] + u * cam_vec[7] + v * cam_vec[10] - o[1]
    dvz = cam_vec[5] + u * cam_vec[8] + v * cam_vec[11] - o[2]
    dlen = jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz)

    onep = jnp.ones((N,), jnp.float32)
    zerop = jnp.zeros((N,), jnp.float32)
    state = jnp.stack([
        jnp.broadcast_to(o[0], (N,)), jnp.broadcast_to(o[1], (N,)),
        jnp.broadcast_to(o[2], (N,)),
        dvx / dlen, dvy / dlen, dvz / dlen,
        onep, onep, onep, zerop, zerop, zerop,
        jnp.where(active, 1.0, 0.0)])
    ids = jnp.stack([pix_u, s_u])

    tables_fixed = (sph_table, sphc_b, sphc_r, sub_bounds, sub_counts,
                    grp_bounds, top_bounds, top_ranges)
    segments = jnp.float32(0.0)
    counts = []
    for b in range(depth):
        segments = segments + jnp.sum(state[_ST_ALIVE])
        st3 = state.reshape(STATE_PLANES, rows_total, LANES)
        id3 = ids.reshape(2, rows_total, LANES)
        tables = tables_fixed + (top_order, top_keys, cam_run_bounds,
                                 ref_pts, node_orders, node_keys,
                                 node_run_bounds, root_bound, tri_hbm)
        st3 = _bounce_call(st3, id3, b, tables, block_rows=block_rows,
                           use_exit=(b == 0),
                           node_exit=(node_exit and b > 0),
                           interpret=interpret,
                           debug_counts=debug_counts)
        if debug_counts:
            st3, cnt = st3
            # per-block scalars ride broadcast planes; pick lane [.., 0]
            counts.append(cnt[:5, ::block_rows, 0].T)   # (nblocks, 5)
        state = st3.reshape(STATE_PLANES, N)
        if b < depth - 1:
            order = jnp.argsort(_sort_keys(state, key_lo, key_hi))
            state = state[:, order]
            ids = ids[:, order]

    pix_final = (ids[0] - seed_word).astype(jnp.int32)
    rgb = jnp.stack([state[_ST_RR], state[_ST_RG], state[_ST_RB]], axis=-1)
    img_sum = jnp.zeros((height * width, 3), jnp.float32).at[
        pix_final].add(rgb)
    mean = img_sum.reshape(height, width, 3) * (1.0 / spp)
    if debug_counts:
        return mean, segments, jnp.stack(counts)
    return mean, segments
