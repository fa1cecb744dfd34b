"""HBM-streamed Pallas megakernel for big triangle scenes.

The SMEM-resident kernel (wavefront.py) holds the whole scene in scalar
memory, capping it at ~10k triangles (PALLAS_SMEM_BUDGET_BYTES).  This
variant breaks that wall:

  * the packed triangle table lives in HBM, laid out as 128-wide LEAF
    blocks (a BVH-style median-split orders the triangles so each leaf is
    spatially tight and starts at a lane-aligned column);
  * a two-level bounding-sphere tree (top nodes of ~8 leaves, leaves of
    <=128 triangles, plus a root bound) rides in SMEM scalar-prefetch
    arrays; per bounce the kernel walks TOP NODES FRONT-TO-BACK (visit
    order + entry-distance keys sorted by camera distance, host-side) with
    the same conservative wavefront bound test as the SMEM kernel's
    cluster culling, and on the PRIMARY bounce the walk STOPS as soon as
    every root-relevant lane's closest hit beats the next node's entry
    lower bound (sky lanes are excluded via the root-bound test, so a tile
    that misses the whole mesh skips the walk entirely on every bounce);
  * a PASSING leaf's 128-column slice is DMA'd HBM -> SMEM scratch and its
    members run through the shared triangle tester
    (wavefront._make_tri_body) with leaf-local indices.

  HBM traffic per block-bounce is only the passing leaves (camera-ray
  frusta touch a handful; scattered wavefronts are pruned by the
  entry <= t_best test as hits accumulate), so scene size is bounded by
  HBM, not SMEM: 1M triangles is ~92 MB table + ~26 KB of SMEM bounds.

Spheres stay in SMEM exactly as in wavefront.py (scenes with huge sphere
counts are not a reference capability; the wall was triangles/meshes).

Streaming requires the CORRECT plane equation (parity_plane_sign=False):
under the reference's wrong-sign formula (common.rs:140-141) bounce-ray
hits land at t values unrelated to the triangle's geometry, so no
vertex-derived bound can contain them (same rule as cluster culling in the
SMEM kernel).

Physics is shared with wavefront.py via its module helpers — single source
of truth for the reference semantics (common.rs:263-285, materials.rs).
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
    LANES, SPH_ROWS, TRI_ROWS, BIG, _SEED_MIX,
    _block_pixel_setup, _bound_test, _make_tri_body, _pcg3d, _scatter_bookkeep,
    _sphere_loop, _sphere_normals, _resolve_tri_normals, _u01,
    _median_split_order, _BOUND_PAD, pack_triangles,
)

LEAF = 128  # leaf width = one lane row of the HBM table (aligned DMA slices)
# HBM memrefs are (8, 128)-tiled: the DMA'd row dimension must be a multiple
# of 8, so the streamed table carries one zero padding row above TRI_ROWS=23
TRI_ROWS_PAD = -(-TRI_ROWS // 8) * 8


def build_tri_stream_tables(scene: Scene, top_fanout: int = 8):
    """Host-side leaf-aligned triangle table + two-level bounds + root.

    Returns (tri_hbm (TRI_ROWS_PAD, L*128) f32, leaf_bounds (4, L) f32,
    leaf_counts (1, L) i32, top_bounds (4, C) f32, top_ranges (2, C) i32,
    root_bound (4, 1) f32).  Leaves are median-split spatial clusters of
    <= 128 valid triangles, padded to 128 columns with never-hit zeros,
    emitted in DFS order (spatially coherent); top node k covers leaves
    [top_ranges[0,k], top_ranges[1,k]) — DFS-consecutive groups, so they
    are spatially tight too.
    """
    v0 = np.asarray(scene.tri_v0, np.float64)
    v1 = np.asarray(scene.tri_v1, np.float64)
    v2 = np.asarray(scene.tri_v2, np.float64)
    valid = np.asarray(scene.tri_valid)
    vidx = np.nonzero(valid)[0]
    cen = (v0 + v1 + v2) / 3.0
    perm_v, slices = _median_split_order(cen[vidx], LEAF)
    perm_valid = vidx[perm_v]
    L = max(len(slices), 1)

    # pack all valid triangles in split order, then scatter into the
    # leaf-aligned layout (zero columns never hit: zero normal -> parallel)
    packed = pack_triangles(scene, perm=np.concatenate(
        [perm_valid, np.nonzero(~valid)[0]]).astype(np.int64))
    tri_hbm = np.zeros((TRI_ROWS_PAD, L * LEAF), np.float32)
    leaf_bounds = np.zeros((4, L), np.float32)
    leaf_counts = np.zeros((1, L), np.int32)
    for k, (s, e) in enumerate(slices or [(0, 0)]):
        n = e - s
        tri_hbm[:TRI_ROWS, k * LEAF:k * LEAF + n] = packed[:, s:e]
        leaf_counts[0, k] = n
        if n == 0:
            leaf_bounds[3, k] = -1.0
            continue
        mem = perm_valid[s:e]
        verts = np.concatenate([v0[mem], v1[mem], v2[mem]], axis=0)
        bc = (verts.min(axis=0) + verts.max(axis=0)) * 0.5
        br = float(np.max(np.linalg.norm(verts - bc, axis=-1)))
        br = br * _BOUND_PAD + 1e-4
        leaf_bounds[0:3, k] = bc
        leaf_bounds[3, k] = br * br

    Ctop = max(-(-L // top_fanout), 1)
    top_bounds = np.zeros((4, Ctop), np.float32)
    top_ranges = np.zeros((2, Ctop), np.int32)
    for k in range(Ctop):
        l0, l1 = k * top_fanout, min((k + 1) * top_fanout, L)
        top_ranges[0, k], top_ranges[1, k] = l0, l1
        members = [m for m in range(l0, l1) if leaf_counts[0, m] > 0]
        if not members:
            top_bounds[3, k] = -1.0
            continue
        bc = (leaf_bounds[0:3, members].min(axis=1)
              + leaf_bounds[0:3, members].max(axis=1)) * 0.5
        br = 0.0
        for m in members:
            d = float(np.linalg.norm(leaf_bounds[0:3, m] - bc))
            br = max(br, d + float(np.sqrt(leaf_bounds[3, m])))
        br = br * _BOUND_PAD + 1e-4
        top_bounds[0:3, k] = bc
        top_bounds[3, k] = br * br

    # root bound: union of the leaf bounding spheres — the kernel uses it to
    # exclude rays that cannot hit ANY triangle from the early-exit test
    root = np.zeros((4, 1), np.float32)
    live = [k for k in range(L) if leaf_counts[0, k] > 0]
    if live:
        bc = (leaf_bounds[0:3, live].min(axis=1)
              + leaf_bounds[0:3, live].max(axis=1)) * 0.5
        br = 0.0
        for m in live:
            d = float(np.linalg.norm(leaf_bounds[0:3, m] - bc))
            br = max(br, d + float(np.sqrt(leaf_bounds[3, m])))
        br = br * _BOUND_PAD + 1e-4
        root[0:3, 0] = bc
        root[3, 0] = br * br
    else:
        root[3, 0] = -1.0
    return (tri_hbm, leaf_bounds, leaf_counts, top_bounds,
            top_ranges, root)


def sorted_top_order(top_bounds, origin):
    """Front-to-back TOP-NODE visit order for a render from ``origin``.

    Returns (order (1, C) i32, keys (1, C) f32): top nodes sorted by
    ``dist(origin, center) - radius`` — a lower bound on any
    ray-from-origin's entry distance into the node, so the kernel's
    primary-bounce walk can STOP once every relevant lane's closest hit is
    nearer than ``keys[oi]`` (keys are nondecreasing along the order).
    Empty nodes sort last with +inf keys.
    """
    b = np.asarray(top_bounds, np.float32)
    L = b.shape[1]
    d = np.linalg.norm(b[0:3].T - np.asarray(origin, np.float32), axis=1)
    keys = d - np.sqrt(np.maximum(b[3], 0.0))
    keys = np.where(b[3] < 0.0, np.inf, keys).astype(np.float32)
    order = np.argsort(keys, kind="stable").astype(np.int32)
    return order.reshape(1, L), keys[order].reshape(1, L)


def _make_stream_kernel(width, height, spp, depth, n_spheres, block_rows,
                        n_sph_clusters, n_tops, shard_rows):
    R = block_rows
    ntx = pl.cdiv(width, LANES)
    inv_w1 = np.float32(width - 1)
    inv_h1 = np.float32(height - 1)

    def kernel(cam_ref, sph_ref, sphc_b_ref, sphc_r_ref, leafb_ref,
               leafn_ref, topb_ref, topr_ref, order_ref, keys_ref,
               root_ref, seed_ref, tri_hbm, out_ref, tri_smem, dma_sem):
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

            alive_f = jnp.where(active0, 1.0, 0.0)

            def bounce_cond(st):
                b = st[0]
                alive_f = st[13]
                return (b < depth) & (jnp.sum(alive_f) > 0.0)

            def bounce_body(st):
                (b, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb,
                 rr, rg, rb, alive_f, seg) = st
                alive = alive_f > 0.5
                seg = seg + alive_f

                hs0 = (jnp.full((R, LANES), BIG),
                       zero, zero, one,
                       zero, zero, zero, zero,
                       zero, one)
                hs = _sphere_loop(sph_ref, sphc_b_ref, sphc_r_ref,
                                  n_spheres, n_sph_clusters,
                                  ox, oy, oz, dx, dy, dz, alive, hs0)
                hs, (hpx, hpy, hpz) = _sphere_normals(
                    ox, oy, oz, dx, dy, dz, hs)

                # ---- streamed triangles: sorted leaf walk + early exit ---
                tri_body = _make_tri_body(
                    lambda row, i: tri_smem[row, i], False,
                    ox, oy, oz, dx, dy, dz)

                # Lanes whose ray misses the ROOT bound can never hit a
                # triangle — exclude them from the exit test so sky rays
                # don't hold t_best=BIG and pin the walk open.
                root_p = _bound_test(root_ref, 0, ox, oy, oz, dx, dy, dz,
                                     jnp.full((R, LANES), BIG), alive)

                # keys_ref[0, oi] (nondecreasing) lower-bounds the entry
                # distance of any PRIMARY ray into top node order_ref[0,oi]
                # (all primaries share the camera origin).  Once every
                # root-relevant lane's closest hit beats that bound, no
                # remaining node can change the image: stop.  For bounce>0
                # the origins differ, so the bound is invalid and the walk
                # runs to the end (per-node/leaf entry<=t_best culling
                # still prunes) — unless NO lane is root-relevant, which
                # exits immediately on any bounce.
                is_primary = (b == 0)

                def leaf_body(li, hs):
                    t_best = hs[0]
                    possible = _bound_test(leafb_ref, li, ox, oy, oz,
                                           dx, dy, dz, t_best, alive)
                    any_p = jnp.max(jnp.where(possible, 1.0, 0.0))
                    n_mem = jnp.where(any_p > 0.0, leafn_ref[0, li], 0)

                    @pl.when(any_p > 0.0)
                    def _():
                        dma = pltpu.make_async_copy(
                            tri_hbm.at[:, pl.ds(li * LEAF, LEAF)],
                            tri_smem, dma_sem)
                        dma.start()
                        dma.wait()

                    return jax.lax.fori_loop(0, n_mem, tri_body, hs)

                def walk_cond(wst):
                    oi, hs = wst[0], wst[1:]
                    t_best = hs[0]
                    # root-irrelevant lanes contribute -BIG: a tile with NO
                    # root-relevant lane exits immediately on any bounce
                    relevant_t = jnp.where(root_p, t_best, -BIG)
                    oi_safe = jnp.minimum(oi, n_tops - 1)
                    exit_key = jnp.where(is_primary, keys_ref[0, oi_safe],
                                         jnp.float32(-1.0))
                    # >= (not >): a node whose entry bound EQUALS t_best can
                    # still hold a triangle at exactly t == t_best, which
                    # wins the tie (t <= t_best in _make_tri_body) — keep
                    # walking so ties resolve identically to the full walk
                    return (oi < n_tops) & (jnp.max(relevant_t) >= exit_key)

                def walk_body(wst):
                    oi, hs = wst[0], wst[1:]
                    t_best = hs[0]
                    ci = order_ref[0, oi]
                    possible = _bound_test(topb_ref, ci, ox, oy, oz,
                                           dx, dy, dz, t_best, alive)
                    any_p = jnp.max(jnp.where(possible, 1.0, 0.0))
                    l0 = jnp.where(any_p > 0.0, topr_ref[0, ci], 0)
                    l1 = jnp.where(any_p > 0.0, topr_ref[1, ci], 0)
                    hs = jax.lax.fori_loop(l0, l1, leaf_body, hs)
                    return (oi + 1,) + hs

                wst = jax.lax.while_loop(walk_cond, walk_body,
                                         (jnp.int32(0),) + hs)
                hs = _resolve_tri_normals(wst[1:])
                t_best = hs[0]
                hpx = ox + t_best * dx
                hpy = oy + t_best * dy
                hpz = oz + t_best * dz

                (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb,
                 alive_f, seg) = _scatter_bookkeep(
                    pix_u, s_u, b, ox, oy, oz, dx, dy, dz, hpx, hpy, hpz,
                    hs, tpr, tpg, tpb, rr, rg, rb, alive, seg)
                return (b + 1, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb,
                        rr, rg, rb, alive_f, seg)

            st = (jnp.int32(0), ox, oy, oz, dx, dy, dz, one, one, one,
                  zero, zero, zero, alive_f, seg)
            st = jax.lax.while_loop(bounce_cond, bounce_body, st)
            rr, rg, rb, seg = st[10], st[11], st[12], st[14]
            return (acc_r + rr, acc_g + rg, acc_b + rb, seg)

        acc_r, acc_g, acc_b, seg = jax.lax.fori_loop(
            0, spp, trace_sample, (zero, zero, zero, zero))

        inv_spp = jnp.float32(1.0 / spp)
        out_ref[0] = acc_r * inv_spp
        out_ref[1] = acc_g * inv_spp
        out_ref[2] = acc_b * inv_spp
        out_ref[3] = seg

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "samples_per_pixel", "depth",
                     "block_rows", "interpret", "shard_rows"))
def render_linear_pallas_stream(sph_table, tri_hbm, leaf_bounds, leaf_counts,
                                top_bounds, top_ranges, root_bound,
                                cam_vec, *,
                                width, height, samples_per_pixel, depth,
                                seed=0, block_rows=32, interpret=False,
                                sph_clusters=None, top_order=None,
                                top_keys=None, shard_rows=None,
                                row_offset=0, row_stride=1):
    """Mean linear radiance [rows, W, 3] + segment count via the
    HBM-streamed kernel.  Table args come from pack_spheres +
    build_tri_stream_tables; sharding args as in render_linear_pallas.
    Always uses the CORRECT triangle plane equation
    (parity_plane_sign=False).

    top_order/top_keys (from ``sorted_top_order(top_bounds,
    camera.origin)``) enable the primary-bounce front-to-back early exit;
    without them top nodes are visited in table order and the walk never
    exits early on the primary bounce (identical image either way — the
    exit test keeps walking through entry-bound ties, so even exact-tie
    closest hits resolve like the full walk)."""
    if shard_rows is None:
        shard_rows = height
    ntx = pl.cdiv(width, LANES)
    nty = pl.cdiv(shard_rows, block_rows)
    nblocks = ntx * nty
    rows_total = nblocks * block_rows
    n_spheres = sph_table.shape[1]
    n_tops = top_bounds.shape[1]
    if top_order is None:
        top_order = jnp.arange(n_tops, dtype=jnp.int32).reshape(1, -1)
        # -inf keys: the primary walk never exits early in table order
        top_keys = jnp.full((1, n_tops), -jnp.inf, jnp.float32)

    if sph_clusters is None:
        sphc_b = jnp.zeros((6, 1), jnp.float32)
        sphc_r = jnp.zeros((2, 1), jnp.int32)
        n_sph_clusters = 0
    else:
        sphc_b, sphc_r = sph_clusters
        n_sph_clusters = sphc_b.shape[1]

    kernel = _make_stream_kernel(width, height, samples_per_pixel, depth,
                                 n_spheres, block_rows, n_sph_clusters,
                                 n_tops, shard_rows)

    seed_arr = jnp.stack([
        jnp.uint32(seed) * _SEED_MIX,
        jnp.asarray(row_offset, jnp.int32).astype(jnp.uint32),
        jnp.asarray(row_stride, jnp.int32).astype(jnp.uint32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=12,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # tri table in HBM
        out_specs=pl.BlockSpec((4, block_rows, LANES),
                               lambda i, *prefetch: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((TRI_ROWS_PAD, LEAF), jnp.float32),  # DMA'd leaf
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    img = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, rows_total, LANES), jnp.float32),
        interpret=interpret,
    )(cam_vec, sph_table, sphc_b, sphc_r, leaf_bounds, leaf_counts,
      top_bounds, top_ranges, top_order, top_keys, root_bound, seed_arr,
      tri_hbm)

    tiles = img.reshape(4, nty, ntx, block_rows, LANES)
    planes = tiles.transpose(0, 1, 3, 2, 4).reshape(
        4, nty * block_rows, ntx * LANES)[:, :shard_rows, :width]
    mean = jnp.moveaxis(planes[:3], 0, -1)
    return mean, jnp.sum(tiles[3])
