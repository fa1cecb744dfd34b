"""Binned per-bounce renderer: row-granularity ray regrouping by
NEXT-CANDIDATE TOP NODE, with all heavy data movement done the TPU way.

The sorted engine (wavefront_sorted.py) reorders individual rays between
bounces with a position+direction Morton key.  Round-3 counters showed its
limit: a divergent block's candidate-top UNION is still ~20-50x what one
ray needs (bounce-1 blocks grind ~4.6k triangle tests vs ~280 on coherent
primaries), and its XLA glue — a 1M-element argsort+gather per bounce
(~16 ms), a 1M scatter-add for image assembly (~14 ms), and host-side
primary-ray setup — costs more than the whole per-chip ray budget for the
10k-triangle OBJ config.

Pipeline per frame (depth D):

  P0 kernel  — one launch: per-block camera tiles generate primary rays
     in-kernel (pcg3d jitter, same counter streams as every engine),
     sphere loop, camera-ordered front-to-back triangle walk with early
     exit, shade (materials.rs semantics via _scatter_bookkeep), and
     NEXT-TOP SELECTION: each lane scans the top-node bounds (through a
     supertop 2-level scan past 48 tops) for the nearest candidate its
     new ray could hit, emits a per-lane sort key
     [chosen top | direction class | origin cell], and a per-lane
     WALK-EXIT BOUND (the farthest AABB exit over every overlapping
     top — no hit can lie beyond it).
  (regroup)  — per-RAY argsort of the keys + 15-plane gather.  Round-5
     sweeps pinned this as load-bearing at FINE granularity: coarse
     row/chunk variants are 3-5x slower end-to-end because live rays
     stop packing densely under the autotuned bounce caps (dead-ray
     compaction matters more than the gather cost; see PERFSTUDY
     "r5_binned_decomposition").
  PF kernel  x (D-1): sphere loop + node-ordered walk with the
     secondary-bounce exit of the sorted engine, per-lane exit-bound
     walk caps (stragglers crossing empty corridors stop pinning their
     block), shade, and selection.

Ray identity travels as a STATE PLANE (row id, exact in f32), so pixel
ids and RNG streams are recomputed in-kernel from the row id and the
static tile layout; the image is assembled by inverting the row
permutation (argsort of #rows) and a pure reshape/transpose — no scatter
anywhere.

Physics is shared with wavefront.py (_sphere_loop/_make_tri_body edge
function/_scatter_bookkeep), so the image agrees with the other engines
to float rounding.  Reference semantics: common.rs:263-285 (bounce
rules), common.rs:124-166 (triangle test, correct-sign plane equation
only — culling soundness), materials.rs:30-102 (scatter rules).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import (
    LANES, TRI_ROWS, BIG, T_MIN, _SEED_MIX,
    _bound_test, _make_tri_body, _pcg3d, _scatter_bookkeep,
    _sphere_loop, _sphere_normals, _resolve_tri_normals, _u01,
)
from .wavefront_stream import TRI_ROWS_PAD
from .wavefront_sorted import (
    SUB, GROUP_SUBS, GROUP, TOP_GROUPS, TOP_SPAN, RUN,
    STATE_PLANES as _SORTED_STATE_PLANES,  # noqa: F401 (same ray planes)
    _ST_OX, _ST_OY, _ST_OZ, _ST_DX, _ST_DY, _ST_DZ,
    _ST_TPR, _ST_TPG, _ST_TPB, _ST_RR, _ST_RG, _ST_RB, _ST_ALIVE,
    _run_bounds_jnp, build_tri_sorted_tables,  # noqa: F401 (re-export)
)

# state plane 13 carries the ray's SLOT id (exact in f32 for < 2^24 rays:
# slot = original_row * 128 + lane, the bounce-0 position), so pixel ids
# and RNG streams survive any regrouping — row-granularity takes or full
# per-ray sorts.  Plane 14 carries the ray's WALK-EXIT BOUND: the
# farthest AABB exit over every top node the ray overlaps, computed
# during next-top selection — no hit can lie beyond it, so it stops
# straggler lanes (rays crossing empty corridors of the scene bound)
# from pinning their block through the whole node walk.  15 planes total:
# every regroup gather and kernel state transfer pays per plane, and
# VMEM tiling only constrains the LAST two dims
_ST_SLOT = 13
_ST_EXITB = 14
P_STATE = 15

# supertop selection granularity: next-top selection tests SUPER
# consecutive DFS tops as one union AABB and only descends supertops some
# lane could improve on (the flat per-top scan is O(n_tops) per bounce —
# ~24 ms/frame at 256 tops before this)
SUPER = 16
SUPER_MIN_TOPS = 48   # flat scan below this (supertop overhead > win)

import os as _os
# experiment switch: fetch triangle data per passing GROUP (8 KB) instead
# of per passing TOP (96 KB)
GROUP_DMA = bool(int(_os.environ.get("BINNED_GROUP_DMA", "1")))
# group-DMA pipeline depth (ring of SMEM slots kept in flight ahead of
# the grind; must be a power of two).  Scattered 8 KB fetches are
# latency-bound: with depth 2 the 164k bounce-1 pass spends ~1.5 us per
# group DMA; deeper rings hide more of it
DMA_SLOTS = int(_os.environ.get("BINNED_DMA_SLOTS", "4"))

# sort-key layout: [chosen top | 6-bit direction class | 9-bit origin cell]
_KEY_SUB_BITS = 15
_KEY_NOMESH = np.int32(0x7FFE0000)   # live ray, no mesh candidate
_KEY_DEAD = np.int32(0x7FFFFFFF)     # dead lane / dead row


def tile_geometry(width, height, spp, block_rows):
    """Static tile layout: each block is one image tile of
    ``block_rows*LANES/spp`` pixels, as square as powers of two allow.
    Returns (TW, TH, ntx, nty, rows_total)."""
    if spp & (spp - 1) or spp > LANES:
        raise ValueError("binned engine needs power-of-two spp <= 128")
    if block_rows & (block_rows - 1):
        raise ValueError("block_rows must be a power of two")
    pix_blk = block_rows * LANES // spp
    lg = pix_blk.bit_length() - 1
    tw = 1 << ((lg + 1) // 2)
    th = pix_blk // tw
    ntx = -(-width // tw)
    nty = -(-height // th)
    rows_total = ntx * nty * block_rows
    if rows_total * LANES > (1 << 24):
        # slot ids ride an f32 state plane (_ST_SLOT): beyond 2^24 rays
        # they stop being exact and would silently corrupt pixel ids,
        # RNG streams, and the slot-sort image assembly
        raise ValueError(
            f"binned engine ray count {rows_total * LANES} exceeds the "
            f"2^24 f32 slot-id range; render in bands or use the sorted "
            f"engine")
    return tw, th, ntx, nty, rows_total


def _regroup(state, keys, gran):
    """Reorder rays by their sort keys at ``gran``-ray granularity.

    The per-ray (gran=1) path carries every state plane as a PAYLOAD
    operand of one ``lax.sort``: measured on v5e at 1M rays the payload
    sort costs ~1.6 ms nearly independent of operand count (2 vs 12
    payloads: 1.59 vs 1.62 ms), while the old argsort + 15-plane gather
    formulation costs ~15.5 ms — XLA lowers the per-element gather to
    the slow dynamic-gather path, but sort payloads ride the sorting
    network's vectorized permute (PERFSTUDY "r5b_glue").  Coarser
    granularities move contiguous ray-major chunks: gran=128 is a plain
    row take, gran=16 costs ~2 ms."""
    P, rows, lanes = state.shape
    if gran >= lanes:
        rowkey = jnp.min(keys, axis=1)
        order = jnp.argsort(rowkey)
        flat = jnp.moveaxis(state, 0, 1).reshape(rows, P * lanes)
        return jnp.moveaxis(flat[order].reshape(rows, P, lanes), 1, 0)
    if gran == 1:
        ops = jax.lax.sort(
            [keys.reshape(-1)] + [state[i].reshape(-1) for i in range(P)],
            num_keys=1)
        return jnp.stack(ops[1:]).reshape(P, rows, lanes)
    nch = lanes // gran
    ckey = keys.reshape(rows, nch, gran).min(axis=2).reshape(-1)
    order = jnp.argsort(ckey)
    ray_major = state.reshape(P, rows * lanes).T         # free transpose
    chunks = ray_major.reshape(rows * nch, gran * P)
    return chunks[order].reshape(rows * lanes, P).T.reshape(
        P, rows, lanes)


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
    lo > hi and always miss.  2-3x tighter than the bounding-sphere test
    on flat surface patches (the common case for mesh sub-leaves)."""
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


def _make_tri_body_gated(read, ox, oy, oz, dx, dy, dz):
    """Triangle closest-hit body with a scalar gate: the plane test
    (4 scalar reads, ~20 vector ops) runs for every triangle; the edge
    tests + the 10-plane select chain (~50 ops) only run when some lane's
    plane-t actually lands in [T_MIN, t_best].  Semantically identical to
    wavefront._make_tri_body with parity_plane_sign=False (the gate is the
    same predicate the full body applies lane-wise), measured ~1.5x faster
    on walk-heavy scenes where culling already removed most never-hit
    triangles."""
    full_body = _make_tri_body(read, False, ox, oy, oz, dx, dy, dz)

    def tri_body(ti, hs):
        t_best = hs[0]
        tnx = read(0, ti)   # _TRI_NX
        tny = read(1, ti)
        tnz = read(2, ti)
        td = read(3, ti)
        nd = tnx * dx + tny * dy + tnz * dz
        no = tnx * ox + tny * oy + tnz * oz
        par = jnp.abs(nd) < 1e-8
        nd_safe = jnp.where(par, 1.0, nd)
        t = (td - no) / nd_safe
        ok0 = (~par) & (t >= T_MIN) & (t <= t_best)
        any0 = jnp.max(jnp.where(ok0, 1.0, 0.0))
        return jax.lax.cond(any0 > 0.0,
                            lambda: full_body(ti, hs),
                            lambda: hs)

    return tri_body


def _make_pass_kernel(width, height, spp, n_spheres, n_sph_clusters,
                      n_tops, block_rows, *, primary, is_last, node_exit,
                      tw, th, ntx, tile_row_stride=1, gated_tris=False,
                      super_selection=None, debug_counts=False,
                      dbg_no_dma=False, dbg_no_tri=False,
                      dbg_no_sub=False):
    """One render pass over a (block_rows x LANES)-ray block.

    ``primary``: generate bounce-0 camera rays in-kernel (no state input)
    and walk in the camera's front-to-back top order with early exit.
    Otherwise the state block arrives regrouped by chosen top and the walk
    uses the secondary-bounce reference-point order (``node_exit``).
    ``is_last``: skip next-top selection (keys become all-dead).
    """
    R = block_rows
    lgspp = spp.bit_length() - 1
    lgtw = tw.bit_length() - 1
    inv_w1 = np.float32(max(width - 1, 1))
    inv_h1 = np.float32(max(height - 1, 1))
    if super_selection is None:
        super_selection = n_tops >= SUPER_MIN_TOPS
    use_super = (not is_last) and super_selection

    def kernel(*refs):
        (sph_ref, sphc_b_ref, sphc_r_ref, subb_ref, subn_ref, grpb_ref,
         topb_ref, topr_ref, order_ref, keys_ref, crunb_ref, refp_ref,
         norder_ref, nkeys_ref, nrunb_ref, root_ref, klo_ref, khi_ref,
         suba_ref, grpa_ref, topa_ref, supa_ref, topap_ref, cam_ref,
         seedb_ref) = refs[:25]
        refs = refs[25:]
        if not primary:
            state_ref = refs[0]
            refs = refs[1:]
        tri_hbm = refs[0]
        out_ref, keys_out = refs[1], refs[2]
        refs = refs[3:]
        if debug_counts:
            cnt_ref = refs[0]
            refs = refs[1:]
        if use_super:
            tri_smem, dma_sem, sel_scr = refs
        else:
            tri_smem, dma_sem = refs

        b = seedb_ref[1].astype(jnp.int32)
        seed_word = seedb_ref[0]
        ty_off = seedb_ref[2].astype(jnp.int32)
        samp_off = seedb_ref[3].astype(jnp.int32)
        blk = pl.program_id(0)

        zero = jnp.zeros((R, LANES), jnp.float32)
        one = jnp.ones((R, LANES), jnp.float32)

        # ---- ray identity from the slot-id plane ------------------------
        if primary:
            rid = (blk * R
                   + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0))
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
            slot = rid * LANES + lane
        else:
            slot = state_ref[_ST_SLOT].astype(jnp.int32)
        t_idx = jax.lax.shift_right_logical(
            slot, np.int32((R * LANES).bit_length() - 1))
        sl = slot & np.int32(R * LANES - 1)
        p = jax.lax.shift_right_logical(sl, np.int32(lgspp))
        s = sl & np.int32(spp - 1)
        ty_l = t_idx // np.int32(ntx)
        tx = t_idx - ty_l * np.int32(ntx)
        # sharded renders interleave TILE ROWS across devices: device i
        # owns global tile rows i, i+n, ... (pixel math depends only on
        # the global (row, col), so shards match the single-device image)
        ty = ty_l * np.int32(tile_row_stride) + ty_off
        prow = ty * np.int32(th) + jax.lax.shift_right_logical(
            p, np.int32(lgtw))
        pcol = tx * np.int32(tw) + (p & np.int32(tw - 1))
        active0 = (prow < height) & (pcol < width)
        prow_c = jnp.minimum(prow, height - 1)
        pcol_c = jnp.minimum(pcol, width - 1)
        pix_u = (prow_c * width + pcol_c).astype(jnp.uint32) + seed_word
        # sample streams are counter-based on the GLOBAL sample index:
        # non-power-of-two spp renders as power-of-two sub-renders whose
        # offsets partition 0..spp-1 (ops._binned_spp_parts)
        s_u = (s + samp_off).astype(jnp.uint32)

        # ---- ray state --------------------------------------------------
        if primary:
            ju, jv, _ = _pcg3d(pix_u, s_u, jnp.uint32(0))
            u = (pcol_c.astype(jnp.float32) + _u01(ju)) / inv_w1
            v = (prow_c.astype(jnp.float32) + _u01(jv)) / inv_h1
            ox0 = cam_ref[0]
            oy0 = cam_ref[1]
            oz0 = cam_ref[2]
            dvx = cam_ref[3] + u * cam_ref[6] + v * cam_ref[9] - ox0
            dvy = cam_ref[4] + u * cam_ref[7] + v * cam_ref[10] - oy0
            dvz = cam_ref[5] + u * cam_ref[8] + v * cam_ref[11] - oz0
            dlen = jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz)
            ox = jnp.broadcast_to(ox0, (R, LANES))
            oy = jnp.broadcast_to(oy0, (R, LANES))
            oz = jnp.broadcast_to(oz0, (R, LANES))
            dx = dvx / dlen
            dy = dvy / dlen
            dz = dvz / dlen
            tpr = tpg = tpb = one
            rr = rg = rb = zero
            alive_f = jnp.where(active0, 1.0, 0.0)
        else:
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
        inv_x, inv_y, inv_z = _safe_inv_dir(dx, dy, dz)

        # ---- closest hit: spheres then the triangle walk ----------------
        hs0 = (jnp.full((R, LANES), BIG),
               zero, zero, one,
               zero, zero, zero, zero,
               zero, one)
        hs = _sphere_loop(sph_ref, sphc_b_ref, sphc_r_ref, n_spheres,
                          n_sph_clusters, ox, oy, oz, dx, dy, dz, alive,
                          hs0)
        hs, _ = _sphere_normals(ox, oy, oz, dx, dy, dz, hs)

        def make_tri_body(read):
            if gated_tris:
                return _make_tri_body_gated(read, ox, oy, oz, dx, dy, dz)
            return _make_tri_body(read, False, ox, oy, oz, dx, dy, dz)

        # root-exit culling cap (see wavefront_sorted.py): a lane can only
        # hit triangles before it leaves the root bound, and lanes missing
        # the root get -BIG so they never pin a walk open
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
        t_cap = jnp.where(root_p, rexit * jnp.float32(1.0005) + 1e-4, -BIG)
        if not primary:
            # per-lane walk-exit bound from the PREVIOUS selection: the
            # farthest AABB exit over every top this ray overlaps — a
            # tighter straggler cap than the root-sphere exit for rays
            # crossing empty corridors of the scene bound
            t_cap = jnp.minimum(t_cap, state_ref[_ST_EXITB])

        def cull_t(t_best):
            return jnp.minimum(t_best, t_cap)

        use_exit = primary
        if node_exit and not primary:
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
        use_node = node_exit and not primary

        def _grp_dma(g, slot):
            """Async copy descriptor for group ``g`` -> SMEM slot
            ``slot`` (the same descriptor starts and waits)."""
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(g * GROUP, GROUP)],
                tri_smem.at[slot], dma_sem.at[slot])

        def make_grp_body(g0r, g1r):
            def grp_body(g, carry):
                c_grp, c_sub, c_tri = carry[0], carry[1], carry[2]
                hs = carry[3:]
                possible = _aabb_test(grpa_ref, g, ox, oy, oz, inv_x,
                                      inv_y, inv_z, cull_t(hs[0]), alive)
                any_g = jnp.max(jnp.where(possible, 1.0, 0.0))
                c_grp = c_grp + (any_g > 0.0).astype(jnp.int32)
                if GROUP_DMA and not dbg_no_dma:
                    # PIPELINED ring buffer: group g's 8 KB fetch was
                    # started DMA_SLOTS-1 iterations ahead (visit_body
                    # primes the ring) into slot g % DMA_SLOTS; start
                    # g+DMA_SLOTS-1 before waiting, so several scattered
                    # fetches stay in flight while this group's sub/tri
                    # grind runs (scattered 8 KB DMAs are latency-bound:
                    # ~1.5 us each with a depth-2 ring on the 164k
                    # bounce-1 pass, the single largest frame cost).
                    # Every group in [g0, g1) is fetched regardless of
                    # its AABB test: the extra fetches ride the otherwise
                    # idle DMA engine
                    @pl.when(g + DMA_SLOTS - 1 < g1r)
                    def _():
                        _grp_dma(g + DMA_SLOTS - 1,
                                 (g + DMA_SLOTS - 1) & (DMA_SLOTS - 1)
                                 ).start()
                    _grp_dma(g, g & (DMA_SLOTS - 1)).wait()
                    base = 0
                    tri_body = make_tri_body(
                        lambda row, i: tri_smem[g & (DMA_SLOTS - 1),
                                                row, i])
                elif GROUP_DMA:
                    base = 0
                    tri_body = make_tri_body(
                        lambda row, i: tri_smem[g & (DMA_SLOTS - 1),
                                                row, i])
                else:
                    base = (g - g0r) * GROUP
                    tri_body = make_tri_body(
                        lambda row, i: tri_smem[row, i])

                def sub_body(k, carry2):
                    c_sub, c_tri = carry2[0], carry2[1]
                    hs = carry2[2:]
                    li = g * GROUP_SUBS + k
                    if dbg_no_sub:
                        n = jnp.where(any_g > 0.0, subn_ref[0, li], 0)
                    else:
                        psub = _aabb_test(suba_ref, li, ox, oy, oz,
                                          inv_x, inv_y, inv_z,
                                          cull_t(hs[0]), alive)
                        any_s = jnp.max(jnp.where(psub, 1.0, 0.0))
                        n = jnp.where((any_s > 0.0) & (any_g > 0.0),
                                      subn_ref[0, li], 0)
                    c_sub = c_sub + (n > 0).astype(jnp.int32)
                    c_tri = c_tri + n
                    off = base + k * SUB

                    # 4x unroll; the rounded-up columns stay inside this
                    # sub-leaf's zero-padded 32-column slot (never hit)
                    def tri4(q, c):
                        tj = off + q * 4
                        for u in range(4):
                            c = tri_body(tj + u, c)
                        return c

                    if not dbg_no_tri:
                        hs = jax.lax.fori_loop(0, (n + 3) >> 2, tri4, hs)
                    return (c_sub, c_tri) + hs

                out = jax.lax.fori_loop(0, GROUP_SUBS, sub_body,
                                        (c_sub, c_tri) + hs)
                return (c_grp,) + out
            return grp_body

        R8 = -(-n_tops // RUN)

        def walk_cond(wst):
            ri, hs = wst[0], wst[5:]
            relevant_t = cull_t(hs[0])
            ki = jnp.minimum(ri * RUN, n_tops - 1)
            if use_exit:
                return ((ri < R8)
                        & (jnp.max(relevant_t) >= keys_ref[0, ki]))
            if use_node:
                exit_key = nkeys_ref[ref_i, ki] - dmax
                return ((ri < R8)
                        & (jnp.max(relevant_t) >= exit_key))
            return ((ri < R8)
                    & (jnp.max(relevant_t) >= jnp.float32(-1.0)))

        def visit_body(oi, carry):
            c_top = carry[0]
            counters = carry[1:4]
            hs = carry[4:]
            if use_node:
                ci = norder_ref[ref_i, oi]
            else:
                ci = order_ref[0, oi]
            possible = _aabb_test(topa_ref, ci, ox, oy, oz, inv_x,
                                  inv_y, inv_z, cull_t(hs[0]), alive)
            any_p = jnp.max(jnp.where(possible, 1.0, 0.0))
            c_top = c_top + (any_p > 0.0).astype(jnp.int32)
            g0r = topr_ref[0, ci]

            if not GROUP_DMA:
                @pl.when(any_p > 0.0)
                def _():
                    dma = pltpu.make_async_copy(
                        tri_hbm.at[:, pl.ds(g0r * GROUP, TOP_SPAN)],
                        tri_smem, dma_sem)
                    dma.start()
                    dma.wait()

            g0 = jnp.where(any_p > 0.0, g0r, 0)
            g1 = jnp.where(any_p > 0.0, topr_ref[1, ci], 0)
            if GROUP_DMA and not dbg_no_dma:
                # prime the ring: start the first DMA_SLOTS-1 groups (the
                # loop body keeps the ring full from there)
                @pl.when(any_p > 0.0)
                def _():
                    for q in range(DMA_SLOTS - 1):
                        @pl.when(g0r + q < g1)
                        def _(q=q):
                            _grp_dma(g0r + q,
                                     (g0r + q) & (DMA_SLOTS - 1)).start()
            out = jax.lax.fori_loop(g0, g1, make_grp_body(g0r, g1),
                                    counters + hs)
            return (c_top,) + out

        def walk_body(wst):
            ri = wst[0]
            carry = wst[1:]
            if use_exit:
                run_p = _bound_test(crunb_ref, ri, ox, oy, oz, dx, dy, dz,
                                    cull_t(carry[4]), alive)
                any_r = jnp.max(jnp.where(run_p, 1.0, 0.0)) > 0.0
            elif use_node:
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
            for q in range(5):
                cnt_ref[q] = jnp.broadcast_to(wst[q], (R, LANES))
            for q in range(5, 8):
                cnt_ref[q] = jnp.zeros((R, LANES), jnp.int32)
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
        out_ref[_ST_SLOT] = slot.astype(jnp.float32)

        # ---- next-top selection -> per-lane sort keys + exit bound ------
        if is_last:
            out_ref[_ST_EXITB] = zero
            keys_out[...] = jnp.full((R, LANES), _KEY_DEAD, jnp.int32)
        else:
            alive2 = alive_f > 0.5
            niv_x, niv_y, niv_z = _safe_inv_dir(dx, dy, dz)

            def top_entry(aref, c):
                tx0 = (aref[0, c] - ox) * niv_x
                tx1 = (aref[3, c] - ox) * niv_x
                ty0 = (aref[1, c] - oy) * niv_y
                ty1 = (aref[4, c] - oy) * niv_y
                tz0 = (aref[2, c] - oz) * niv_z
                tz1 = (aref[5, c] - oz) * niv_z
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1),
                                jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
                tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                               jnp.maximum(ty0, ty1)),
                                   jnp.maximum(tz0, tz1))
                return tnear, tfar, (tnear <= tfar) & (tfar > T_MIN)

            if use_super:
                # two-level scan: one union-AABB test per SUPER
                # consecutive DFS tops; descend (pl.when on a scalar, so
                # skipped supertops really are skipped - lax.cond would
                # execute both branches) only when some live lane could
                # improve on its current best entry.  best (e, c) live in
                # VMEM scratch because pl.when bodies cannot carry
                # values; the EXIT BOUND (max tfar over overlapping
                # nodes) accumulates at SUPERTOP granularity - coarser
                # than per-top but conservative, and it never needs the
                # descend
                n_super = supa_ref.shape[1]
                sel_scr[0] = jnp.full((R, LANES), BIG)
                sel_scr[1] = jnp.full((R, LANES), -1.0)

                def s_body(si, exit_e):
                    tnear_s, tfar_s, ok_s = top_entry(supa_ref, si)
                    exit_e = jnp.maximum(
                        exit_e, jnp.where(ok_s, tfar_s, -BIG))
                    guard = jnp.where(alive2, sel_scr[0],
                                      jnp.float32(-BIG))
                    improve = ok_s & (tnear_s < guard)
                    any_i = jnp.max(jnp.where(improve, 1.0, 0.0))

                    @pl.when(any_i > 0.0)
                    def _():
                        be = sel_scr[0]
                        bc = sel_scr[1]
                        for k in range(SUPER):
                            ci = si * SUPER + k
                            tn, _tf, ok = top_entry(topap_ref, ci)
                            e = jnp.where(ok, tn, BIG)
                            better = e < be
                            be = jnp.where(better, e, be)
                            bc = jnp.where(better,
                                           ci.astype(jnp.float32), bc)
                        sel_scr[0] = be
                        sel_scr[1] = bc
                    return exit_e

                exit_e = jax.lax.fori_loop(
                    0, n_super, s_body, jnp.full((R, LANES), -BIG))
                best_e = sel_scr[0]
                best_c = sel_scr[1].astype(jnp.int32)
            else:
                def sel_body(c, carry):
                    best_e, best_c, exit_e = carry
                    tnear, tfar, ok = top_entry(topa_ref, c)
                    exit_e = jnp.maximum(
                        exit_e, jnp.where(ok, tfar, -BIG))
                    e = jnp.where(ok, tnear, BIG)
                    better = e < best_e
                    return (jnp.where(better, e, best_e),
                            jnp.where(better, c, best_c), exit_e)

                best_e, best_c, exit_e = jax.lax.fori_loop(
                    0, n_tops, sel_body,
                    (jnp.full((R, LANES), BIG),
                     jnp.full((R, LANES), -1, jnp.int32),
                     jnp.full((R, LANES), -BIG)))
            found = best_c >= 0
            # conservative margin mirrors the root-exit cap; a lane with
            # no overlapping top can never hit a triangle
            out_ref[_ST_EXITB] = jnp.where(
                found, exit_e * jnp.float32(1.0005) + 1e-4,
                jnp.float32(-BIG))

            klx = klo_ref[0]
            kly = klo_ref[1]
            klz = klo_ref[2]
            spx = jnp.maximum(khi_ref[0] - klx, 1e-6)
            spy = jnp.maximum(khi_ref[1] - kly, 1e-6)
            spz = jnp.maximum(khi_ref[2] - klz, 1e-6)

            def q3(v, lo, span):
                cell = (v - lo) / span * jnp.float32(8.0)
                return jnp.clip(cell, 0.0, 7.0).astype(jnp.int32)

            def qd(v):
                return jnp.clip((v + 1.0) * 2.0, 0.0, 3.0).astype(
                    jnp.int32)

            cell = ((q3(ox, klx, spx) * 64) + (q3(oy, kly, spy) * 8)
                    + q3(oz, klz, spz))
            dir6 = qd(dx) * 16 + qd(dy) * 4 + qd(dz)
            sub_key = dir6 * 512 + cell
            key = jnp.where(
                found, best_c * np.int32(1 << _KEY_SUB_BITS) + sub_key,
                _KEY_NOMESH + sub_key)
            keys_out[...] = jnp.where(alive2, key, _KEY_DEAD)

    return kernel


def _pass_call(tables, cam_vec, seedb, state3, *, width, height, spp,
               block_rows, primary, is_last, node_exit, tw, th, ntx,
               interpret, tile_row_stride=1, gated_tris=False,
               super_selection=None, debug_counts=False,
               dbg_no_dma=False, dbg_no_tri=False, dbg_no_sub=False):
    (sph, sphc_b, sphc_r, subb, subn, grpb, topb, topr, order, keys,
     crunb, refp, norder, nkeys, nrunb, root, klo, khi, suba, grpa,
     topa, supa, topap, tri_hbm) = tables
    n_spheres = sph.shape[1]
    n_sph_clusters = 0 if sphc_b is None else sphc_b.shape[1]
    if sphc_b is None:
        sphc_b = jnp.zeros((6, 1), jnp.float32)
        sphc_r = jnp.zeros((2, 1), jnp.int32)
    n_tops = topb.shape[1]
    if norder is None:
        node_exit = False
    if not node_exit:
        refp = jnp.zeros((4, 1), jnp.float32)
        norder = jnp.zeros((1, 1), jnp.int32)
        nkeys = jnp.zeros((1, 1), jnp.float32)
        nrunb = jnp.zeros((4, 1), jnp.float32)
    R = block_rows
    if primary:
        rows_total = state3  # int: rows to generate
    else:
        rows_total = state3.shape[1]
    nblocks = rows_total // R

    kernel = _make_pass_kernel(width, height, spp, n_spheres,
                               n_sph_clusters, n_tops, R, primary=primary,
                               is_last=is_last, node_exit=node_exit,
                               tw=tw, th=th, ntx=ntx,
                               tile_row_stride=tile_row_stride,
                               gated_tris=gated_tris,
                               super_selection=super_selection,
                               debug_counts=debug_counts,
                               dbg_no_dma=dbg_no_dma,
                               dbg_no_tri=dbg_no_tri,
                               dbg_no_sub=dbg_no_sub)

    state_spec = pl.BlockSpec((P_STATE, R, LANES),
                              lambda i, *prefetch: (0, i, 0),
                              memory_space=pltpu.VMEM)
    keys_spec = pl.BlockSpec((R, LANES), lambda i, *prefetch: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [state_spec, keys_spec]
    out_shape = [jax.ShapeDtypeStruct((P_STATE, rows_total, LANES),
                                      jnp.float32),
                 jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32)]
    if debug_counts:
        out_specs.append(pl.BlockSpec((8, R, LANES),
                                      lambda i, *prefetch: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((8, rows_total, LANES),
                                              jnp.int32))

    in_specs = []
    args = []
    if not primary:
        in_specs.append(state_spec)
        args.append(state3)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(tri_hbm)

    if GROUP_DMA:
        # pipelined ring of group fetches: slot g % DMA_SLOTS per group
        scratch_shapes = [
            pltpu.SMEM((DMA_SLOTS, TRI_ROWS_PAD, GROUP), jnp.float32),
            pltpu.SemaphoreType.DMA((DMA_SLOTS,)),
        ]
    else:
        scratch_shapes = [
            pltpu.SMEM((TRI_ROWS_PAD, TOP_SPAN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    use_super = (super_selection if super_selection is not None
                 else n_tops >= SUPER_MIN_TOPS)
    if (not is_last) and use_super:
        scratch_shapes.append(pltpu.VMEM((2, R, LANES), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=25,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(sph, sphc_b, sphc_r, subb, subn, grpb, topb, topr, order, keys,
      crunb, refp, norder, nkeys, nrunb, root, klo, khi, suba, grpa,
      topa, supa, topap, cam_vec, seedb, *args)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "samples_per_pixel", "depth",
                     "block_rows", "interpret", "node_exit",
                     "gated_tris", "ray_regroup_bounces",
                     "regroup_granularity", "tile_row_stride",
                     "shard_tile_rows", "bounce_caps", "return_alive",
                     "super_selection", "debug_counts"))
def render_linear_pallas_binned(sph_table, tri_hbm, sub_bounds,
                                sub_counts, grp_bounds, top_bounds,
                                top_ranges, root_bound, ref_pts,
                                node_orders, node_keys, node_run_bounds,
                                key_lo, key_hi, sub_aabb, grp_aabb,
                                top_aabb, cam_vec, *,
                                width, height, samples_per_pixel, depth,
                                seed=0, sample_offset=0,
                                block_rows=16, interpret=False,
                                sph_clusters=None, top_order=None,
                                top_keys=None, node_exit=True,
                                gated_tris=False, super_selection=None,
                                ray_regroup_bounces=0,
                                regroup_granularity=16,
                                tile_row_offset=0, tile_row_stride=1,
                                shard_tile_rows=None, bounce_caps=None,
                                return_alive=False,
                                debug_counts=False):
    """Mean linear radiance [H, W, 3] + segment count via the binned
    per-bounce pipeline.  Table args come from pack_spheres +
    build_tri_sorted_tables (shared with the sorted engine);
    top_order/top_keys from ``sorted_top_order(top_bounds,
    camera.origin)`` drive the bounce-0 front-to-back early exit.
    Always the CORRECT plane equation.

    ``tile_row_offset``/``tile_row_stride``/``shard_tile_rows`` render an
    interleaved TILE-ROW subset for shard_map: device i passes
    (offset=i, stride=n, shard_tile_rows=ceil(nty/n)) and owns global
    tile rows i, i+n, ...; per-pixel math depends only on the global
    (row, col), so the deinterleaved shards are bitwise identical to a
    single-device render.

    ``bounce_caps`` (static tuple of row counts for bounces 1..depth-1)
    compacts the working set: after each regroup (dead rays sort last)
    only the first cap rows continue to the next kernel pass; the sliced
    tails — frames whose rays are finished — are carried to assembly
    unchanged, so the image is EXACT whenever every live ray fits under
    the cap.  Live rays beyond a cap are counted in the extra
    ``overflow`` output (returned when caps are given): overflow == 0
    certifies the frame; callers autotune caps from a probe frame and
    re-render uncapped on overflow (ops.render_linear_fast)."""
    spp = samples_per_pixel
    tw, th, ntx, nty, rows_total = tile_geometry(width, height, spp,
                                                 block_rows)
    if shard_tile_rows is not None:
        nty = shard_tile_rows
        rows_total = ntx * nty * block_rows
    n_tops = top_bounds.shape[1]
    if top_order is None:
        top_order = jnp.arange(n_tops, dtype=jnp.int32).reshape(1, -1)
        top_keys = jnp.full((1, n_tops), -jnp.inf, jnp.float32)
    cam_run_bounds = _run_bounds_jnp(top_bounds, top_order)
    if sph_clusters is None:
        sphc_b = sphc_r = None
    else:
        sphc_b, sphc_r = sph_clusters

    # supertop tables: union AABBs of SUPER consecutive DFS tops (DFS
    # neighbors are spatially coherent), padded to a full SUPER multiple
    # with empty boxes (lo > hi always misses) so the in-kernel child
    # unroll needs no bounds check
    n_super = -(-n_tops // SUPER)
    pad = n_super * SUPER - n_tops
    top_aabb_p = jnp.pad(top_aabb, ((0, 0), (0, pad)), mode="constant")
    if pad:
        fix = jnp.concatenate(
            [jnp.zeros((6, n_tops), top_aabb.dtype),
             jnp.tile(jnp.asarray([[1.], [1.], [1.], [-1.], [-1.], [-1.]],
                                  top_aabb.dtype), (1, pad))], axis=1)
        top_aabb_p = top_aabb_p + fix
    sup_lo = top_aabb_p[0:3].reshape(3, n_super, SUPER).min(axis=2)
    sup_hi = top_aabb_p[3:6].reshape(3, n_super, SUPER).max(axis=2)
    super_aabb = jnp.concatenate([sup_lo, sup_hi], axis=0)

    tables = (sph_table, sphc_b, sphc_r, sub_bounds, sub_counts,
              grp_bounds, top_bounds, top_ranges, top_order, top_keys,
              cam_run_bounds, ref_pts, node_orders, node_keys,
              node_run_bounds, root_bound, key_lo, key_hi, sub_aabb,
              grp_aabb, top_aabb, super_aabb, top_aabb_p, tri_hbm)
    seed_word = jnp.uint32(seed) * _SEED_MIX

    ty_off = jnp.asarray(tile_row_offset, jnp.int32).astype(jnp.uint32)
    samp_off = jnp.asarray(sample_offset, jnp.int32).astype(jnp.uint32)

    def seedb(b):
        return jnp.stack([seed_word, jnp.uint32(b), ty_off, samp_off])

    common = dict(width=width, height=height, spp=spp,
                  block_rows=block_rows, node_exit=node_exit, tw=tw,
                  th=th, ntx=ntx, interpret=interpret,
                  tile_row_stride=tile_row_stride,
                  gated_tris=gated_tris,
                  super_selection=super_selection)

    counts = []
    out = _pass_call(tables, cam_vec, seedb(0), rows_total, primary=True,
                     is_last=(depth == 1), debug_counts=debug_counts,
                     **common)
    if debug_counts:
        state, keys, cnt = out
        counts.append(cnt[:5, ::block_rows, 0].T)
    else:
        state, keys = out
    # bounce-0 live count is exactly this shard's in-image lanes
    ty_g = (jnp.asarray(tile_row_offset, jnp.int32)
            + jnp.arange(nty, dtype=jnp.int32) * tile_row_stride)
    rows_v = jnp.clip(height - ty_g * th, 0, th)
    cols_v = jnp.clip(width - jnp.arange(ntx, dtype=jnp.int32) * tw, 0, tw)
    segments = (jnp.sum(rows_v) * jnp.sum(cols_v) * spp).astype(
        jnp.float32)

    tails = []
    overflow = jnp.float32(0.0)
    alive_per_bounce = [segments]
    for b in range(1, depth):
        gran = 1 if b <= ray_regroup_bounces else regroup_granularity
        state = _regroup(state, keys, gran)
        alive_b = jnp.sum(state[_ST_ALIVE])
        # caps are ROW slices: report the live-ROW footprint (in ray
        # equivalents) — at coarse regroup granularity live rays do not
        # pack densely, so ray counts alone would under-cap (the
        # overflow guard caught exactly this)
        live_rows = jnp.sum(
            (jnp.max(state[_ST_ALIVE], axis=1) > 0.0).astype(jnp.float32))
        alive_per_bounce.append(live_rows * LANES)
        segments = segments + alive_b
        if bounce_caps is not None and b - 1 < len(bounce_caps):
            cap = min(bounce_caps[b - 1], state.shape[1])
            cap = max((cap // block_rows) * block_rows, block_rows)
            if cap < state.shape[1]:
                tail = state[:, cap:, :]
                tails.append(tail)
                overflow = overflow + jnp.sum(tail[_ST_ALIVE])
                state = state[:, :cap, :]
        out = _pass_call(tables, cam_vec, seedb(b), state, primary=False,
                         is_last=(b == depth - 1),
                         debug_counts=debug_counts, **common)
        if debug_counts:
            state, keys, cnt = out
            counts.append(cnt[:5, ::block_rows, 0].T)
        else:
            state, keys = out

    # ---- image assembly: invert the regrouping + pure reshape -----------
    # finished tails rejoin the survivors for assembly (their radiance
    # and slot ids are final); together they cover every slot exactly
    if tails:
        state = jnp.concatenate([state] + tails[::-1], axis=1)
    # chunks are atomic across every regroup, so sorting by the slot plane
    # at the finest granularity used restores the exact bounce-0 order
    if depth > 1:
        fin_gran = 1 if ray_regroup_bounces > 0 else regroup_granularity
        if fin_gran == 1:
            # only the radiance leaves the pipeline: one int-keyed sort
            # carrying the three radiance planes as payloads (~1.6 ms at
            # 1M rays vs ~5.5 ms for argsort + (N,3) gather — same
            # payload-sort win as _regroup; slots are unique so
            # stability is irrelevant)
            _, fr, fg, fb = jax.lax.sort(
                [state[_ST_SLOT].reshape(-1).astype(jnp.int32),
                 state[_ST_RR].reshape(-1),
                 state[_ST_RG].reshape(-1),
                 state[_ST_RB].reshape(-1)], num_keys=1)
            rgb = jnp.stack([fr, fg, fb],
                            axis=-1).reshape(rows_total, LANES, 3)
        else:
            state = _regroup(state, state[_ST_SLOT].astype(jnp.int32),
                             fin_gran)
            rgb = jnp.stack([state[_ST_RR], state[_ST_RG],
                             state[_ST_RB]], axis=-1)
    else:
        rgb = jnp.stack([state[_ST_RR], state[_ST_RG], state[_ST_RB]],
                        axis=-1)                   # (rows, LANES, 3)
    ppr = LANES // spp                             # pixels per row
    tiles = rgb.reshape(nty, ntx, block_rows, ppr, spp, 3).sum(axis=4)
    tiles = tiles.reshape(nty, ntx, th, tw, 3)
    img = tiles.transpose(0, 2, 1, 3, 4).reshape(nty * th, ntx * tw, 3)
    if tile_row_stride == 1 and shard_tile_rows is None:
        img = img[:height]
    mean = img[:, :width] * (1.0 / spp)
    if debug_counts:
        return mean, segments, jnp.stack(counts)
    if return_alive:
        return mean, segments, jnp.stack(alive_per_bounce)
    if bounce_caps is not None:
        return mean, segments, overflow
    return mean, segments
