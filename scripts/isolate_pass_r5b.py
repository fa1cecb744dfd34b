"""Component isolation for the binned secondary pass (OBJ-10k bounce 1).

Reproduces the engine's primary pass + per-ray regroup to capture the
exact bounce-1 input state, then times _pass_call variants on it:

  full      — production PF pass (walk + shade + next-top selection)
  nosel     — is_last=True: selection skipped
  nogrind   — top ranges emptied: walk machinery + AABB tests, no
              group/sub loops, no triangle tests
  base      — single empty top: sphere loop + shade + state IO only

Differences give: selection, triangle grind (incl. group/sub tests),
walk overhead, and the irreducible base.
"""
import sys, time, statistics
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_binned as wbn
from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order
from raytracer_tpu.ops.pallas.wavefront_sorted import _run_bounds_jnp

WIDTH = HEIGHT = 512
SPP = 4
BLOCK_ROWS = 16

SCENE = sys.argv[2] if len(sys.argv) > 2 else "obj"
if SCENE == "obj":
    oscene, ocam = rt.models.obj_mesh_scene()
else:
    from raytracer_tpu.models.builders import icosphere_mesh
    from raytracer_tpu.scene import (DIFFUSE, METAL, build_materials,
                                     build_scene)
    btris = (icosphere_mesh((-0.6, 0.0, -1.4), 0.45, 0, 6)
             + icosphere_mesh((0.6, 0.0, -1.2), 0.45, 2, 6))
    bmats = build_materials([(DIFFUSE, (0.7, 0.3, 0.3), 0.0, 1.0),
                             (DIFFUSE, (0.8, 0.8, 0.0), 0.0, 1.0),
                             (METAL, (0.85, 0.85, 0.9), 0.05, 1.0)])
    oscene = build_scene([((0.0, -100.5, -1.0), 100.0, 1)], btris, bmats,
                         exact_planes=True)
    ocam = rt.Camera.new_at((0.0, 0.0, 0.0), 1.77778)
(sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(oscene)
(tri_hbm, subb, subn, grpb, topb, topr, root, refp, norder, nkeys,
 nrunb, klo, khi, suba, grpa, topa) = sorted_t
cv = wf.camera_vec(ocam)
cam_np = np.concatenate([
    np.asarray(ocam.origin, np.float32),
    np.asarray(ocam.lower_left_corner, np.float32),
    np.asarray(ocam.horizontal, np.float32),
    np.asarray(ocam.vertical, np.float32)])
t_order, t_keys = sorted_top_order(np.asarray(topb), cam_np[:3])
t_order, t_keys = jnp.asarray(t_order), jnp.asarray(t_keys)

tw, th, ntx, nty, rows_total = wbn.tile_geometry(WIDTH, HEIGHT, SPP,
                                                 BLOCK_ROWS)
n_tops = topb.shape[1]
sphc_b, sphc_r = sph_cl if sph_cl is not None else (None, None)

# supertop tables (mirrors render_linear_pallas_binned)
SUPER = wbn.SUPER
n_super = -(-n_tops // SUPER)
pad = n_super * SUPER - n_tops
top_aabb_p = jnp.pad(topa, ((0, 0), (0, pad)), mode="constant")
if pad:
    fix = jnp.concatenate(
        [jnp.zeros((6, n_tops), topa.dtype),
         jnp.tile(jnp.asarray([[1.], [1.], [1.], [-1.], [-1.], [-1.]],
                              topa.dtype), (1, pad))], axis=1)
    top_aabb_p = top_aabb_p + fix
sup_lo = top_aabb_p[0:3].reshape(3, n_super, SUPER).min(axis=2)
sup_hi = top_aabb_p[3:6].reshape(3, n_super, SUPER).max(axis=2)
super_aabb = jnp.concatenate([sup_lo, sup_hi], axis=0)
crunb = _run_bounds_jnp(topb, t_order)


def tables_with(topr_x, topa_x):
    return (sph, sphc_b, sphc_r, subb, subn, grpb, topb, topr_x,
            t_order, t_keys, crunb, refp, norder, nkeys, nrunb, root,
            klo, khi, suba, grpa, topa_x, super_aabb, top_aabb_p,
            tri_hbm)


seed_word = jnp.uint32(0) * wf._SEED_MIX


def seedb(b):
    return jnp.stack([seed_word, jnp.uint32(b), jnp.uint32(0),
                      jnp.uint32(0)])


common = dict(width=WIDTH, height=HEIGHT, spp=SPP,
              block_rows=BLOCK_ROWS, node_exit=True, tw=tw, th=th,
              ntx=ntx, interpret=False)

# ---- capture the bounce-1 input: primary pass + per-ray regroup --------
state0, keys0 = jax.jit(lambda: wbn._pass_call(
    tables_with(topr, topa), cv, seedb(0), rows_total, primary=True,
    is_last=False, **common))()
state1 = jax.jit(lambda s, k: wbn._regroup(s, k, 1))(state0, keys0)
keys_of_state1 = jax.lax.sort([keys0.reshape(-1)], num_keys=1)[0].reshape(
    rows_total, wbn.LANES)
print("captured bounce-1 state:", state1.shape, flush=True)


def timeit(tag, fn, *args):
    jf = jax.jit(fn)
    out = jf(*args)
    s = float(jnp.sum(out[0]))  # real sync (tunnel-safe)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _k in range(4):
            out = jf(*args)
        _ = float(jnp.sum(out[0]))
        t4 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _k in range(8):
            out = jf(*args)
        _ = float(jnp.sum(out[0]))
        t8 = time.perf_counter() - t0
        ts.append((t8 - t4) / 4)
    v = statistics.median(ts)
    print(f"{tag:10s} {v*1e3:8.3f} ms", flush=True)
    return v


empty_topr = jnp.zeros_like(topr)
empty_box = jnp.tile(jnp.asarray(
    [[1.], [1.], [1.], [-1.], [-1.], [-1.]], jnp.float32), (1, n_tops))

which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {
    "full", "nosel", "nogrind", "base"}

if "full" in which:
    timeit("full", lambda s: wbn._pass_call(
        tables_with(topr, topa), cv, seedb(1), s, primary=False,
        is_last=False, **common), state1)
if "nosel" in which:
    timeit("nosel", lambda s: wbn._pass_call(
        tables_with(topr, topa), cv, seedb(1), s, primary=False,
        is_last=True, **common), state1)
if "nogrind" in which:
    timeit("nogrind", lambda s: wbn._pass_call(
        tables_with(empty_topr, topa), cv, seedb(1), s, primary=False,
        is_last=False, **common), state1)
if "nogrind-nosel" in which:
    timeit("ng-ns", lambda s: wbn._pass_call(
        tables_with(empty_topr, topa), cv, seedb(1), s, primary=False,
        is_last=True, **common), state1)
if "nodma" in which:
    timeit("nodma", lambda s: wbn._pass_call(
        tables_with(topr, topa), cv, seedb(1), s, primary=False,
        is_last=False, dbg_no_dma=True, **common), state1)
if "notri" in which:
    timeit("notri", lambda s: wbn._pass_call(
        tables_with(topr, topa), cv, seedb(1), s, primary=False,
        is_last=False, dbg_no_tri=True, **common), state1)
if "notri-nodma" in which:
    timeit("nt-nd", lambda s: wbn._pass_call(
        tables_with(topr, topa), cv, seedb(1), s, primary=False,
        is_last=False, dbg_no_tri=True, dbg_no_dma=True, **common),
        state1)
if "nosub" in which:
    timeit("nosub", lambda s: wbn._pass_call(
        tables_with(topr, topa), cv, seedb(1), s, primary=False,
        is_last=False, dbg_no_sub=True, **common), state1)
if "gated" in which:
    c2 = dict(common); c2["gated_tris"] = True
    timeit("gated", lambda s: wbn._pass_call(
        tables_with(topr, topa), cv, seedb(1), s, primary=False,
        is_last=False, **c2), state1)
if "base" in which:
    timeit("base", lambda s: wbn._pass_call(
        tables_with(empty_topr, empty_box), cv, seedb(1), s,
        primary=False, is_last=True, **common), state1)


# ---- experiment: GROUP-level binning keys (brute force, host-side) -----
def group_keys(state):
    """Per-ray next-GROUP selection over all group AABBs + the kernel's
    dir/cell sub-key — what a finer selection granularity would emit."""
    ox = state[wbn._ST_OX].reshape(-1)
    oy = state[wbn._ST_OY].reshape(-1)
    oz = state[wbn._ST_OZ].reshape(-1)
    dx = state[wbn._ST_DX].reshape(-1)
    dy = state[wbn._ST_DY].reshape(-1)
    dz = state[wbn._ST_DZ].reshape(-1)
    alive = state[wbn._ST_ALIVE].reshape(-1) > 0.5
    tiny = jnp.float32(1e-20)

    def inv(v):
        mag = jnp.maximum(jnp.abs(v), tiny)
        return jnp.where(v >= 0.0, 1.0 / mag, -1.0 / mag)
    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    ga = grpa  # (6, n_groups)
    tx0 = (ga[0][:, None] - ox[None]) * ix[None]
    tx1 = (ga[3][:, None] - ox[None]) * ix[None]
    ty0 = (ga[1][:, None] - oy[None]) * iy[None]
    ty1 = (ga[4][:, None] - oy[None]) * iy[None]
    tz0 = (ga[2][:, None] - oz[None]) * iz[None]
    tz1 = (ga[5][:, None] - oz[None]) * iz[None]
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                   jnp.maximum(ty0, ty1)),
                       jnp.maximum(tz0, tz1))
    ok = (tnear <= tfar) & (tfar > wbn.T_MIN)
    e = jnp.where(ok, tnear, wbn.BIG)
    best_g = jnp.argmin(e, axis=0).astype(jnp.int32)
    found = jnp.min(e, axis=0) < wbn.BIG

    klx, kly, klz = klo[0], klo[1], klo[2]
    spx = jnp.maximum(khi[0] - klx, 1e-6)
    spy = jnp.maximum(khi[1] - kly, 1e-6)
    spz = jnp.maximum(khi[2] - klz, 1e-6)

    def q3(v, lo, span):
        cell = (v - lo) / span * jnp.float32(8.0)
        return jnp.clip(cell, 0.0, 7.0).astype(jnp.int32)

    def qd(v):
        return jnp.clip((v + 1.0) * 2.0, 0.0, 3.0).astype(jnp.int32)
    cell = (q3(ox, klx, spx) * 64 + q3(oy, kly, spy) * 8
            + q3(oz, klz, spz))
    dir6 = qd(dx) * 16 + qd(dy) * 4 + qd(dz)
    sub_key = dir6 * 512 + cell
    key = jnp.where(found,
                    best_g * np.int32(1 << wbn._KEY_SUB_BITS) + sub_key,
                    wbn._KEY_NOMESH + sub_key)
    key = jnp.where(alive, key, wbn._KEY_DEAD)
    return key.reshape(state.shape[1], wbn.LANES)


if "groupbin" in which:
    gkeys = jax.jit(group_keys)(state0)
    state1g = jax.jit(lambda s, k: wbn._regroup(s, k, 1))(state0, gkeys)
    timeit("grp-full", lambda s: wbn._pass_call(
        tables_with(topr, topa), cv, seedb(1), s, primary=False,
        is_last=False, **common), state1g)
