"""Round-5 binned-engine frame decomposition on the real TPU.

For each mesh bench config: steady-state frame time (paired batches) plus
the in-kernel walk counters (debug_counts: per block and bounce —
[walk runs, tops visited, groups passed, subs passed, tris tested]), and
a derived cost split under the corrected platform model
(tri test ~30.6 ns/block-test at 2048 lanes, group DMA ~0.43 us/12KB).
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_binned as wbn
from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order
from raytracer_tpu.models.builders import icosphere_mesh
from raytracer_tpu.scene import DIFFUSE, METAL, build_materials, \
    build_scene


def big_scene():
    btris = (icosphere_mesh((-0.6, 0.0, -1.4), 0.45, 0, 6)
             + icosphere_mesh((0.6, 0.0, -1.2), 0.45, 2, 6))
    bmats = build_materials([(DIFFUSE, (0.7, 0.3, 0.3), 0.0, 1.0),
                             (DIFFUSE, (0.8, 0.8, 0.0), 0.0, 1.0),
                             (METAL, (0.85, 0.85, 0.9), 0.05, 1.0)])
    bscene = build_scene([((0.0, -100.5, -1.0), 100.0, 1)], btris, bmats,
                         exact_planes=True)
    bcam = rt.Camera.new_at((0.0, 0.0, 0.0), 1.77778)
    return bscene, bcam


def frame_time(scene, cam, W=512, H=512, spp=4, depth=4, k=8):
    def run(seed):
        return ops_mod.render_linear_fast(
            scene, cam, width=W, height=H, samples_per_pixel=spp,
            depth=depth, seed=seed)
    out = run(0); jax.block_until_ready(out)
    out = run(0); jax.block_until_ready(out)

    def batch(count, seed0):
        t0 = time.perf_counter()
        outs = [run(seed0 + i) for i in range(count)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0, outs[-1]

    times = []
    for t in range(3):
        tk, _ = batch(k, 1 + 100 * t)
        t2k, out = batch(2 * k, 50 + 100 * t)
        times.append(max(t2k - tk, 1e-9) / k)
    assert ops_mod.flush_binned_overflow_checks() == 0
    return min(times), int(out[1])


def counters(scene, cam, W=512, H=512, spp=4, depth=4):
    (sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
    cv = wf.camera_vec(cam)
    order, keys = sorted_top_order(np.asarray(sorted_t[4]),
                                   np.asarray(cam.origin))
    n_tris = int(np.sum(np.asarray(scene.tri_valid)))
    br = 32 if n_tris < 4096 else 16
    mean, segs, cnt = wbn.render_linear_pallas_binned(
        sph, *sorted_t, cv, width=W, height=H, samples_per_pixel=spp,
        depth=depth, seed=0, sph_clusters=sph_cl, block_rows=br,
        ray_regroup_bounces=depth - 1, top_order=jnp.asarray(order),
        top_keys=jnp.asarray(keys), debug_counts=True)
    cnt = np.asarray(cnt)       # (depth, nblocks, 5)
    n_tops = sorted_t[4].shape[1]
    print(f"  n_tops={n_tops} block_rows={br} blocks={cnt.shape[1]} "
          f"segs={int(segs)}")
    tot_tri = 0
    tot_grp = 0
    for b in range(cnt.shape[0]):
        runs, tops, grps, subs, tris = cnt[b].sum(axis=0)
        tot_tri += tris
        tot_grp += grps
        print(f"  bounce{b}: walkruns={runs:>8} tops={tops:>7} "
              f"grps={grps:>8} subs={subs:>8} tris={tris:>10}")
    grind_ms = tot_tri * 30.6e-9 * 1e3 * (br / 16)
    dma_ms = tot_grp * 0.43e-6 * 1e3
    sel_ms = (cnt.shape[1] * depth * n_tops * 22 * 2.1e-9 * 1e3
              * (br / 16))
    print(f"  est grind={grind_ms:.1f} ms  groupDMA={dma_ms:.1f} ms "
        f"  selection~={sel_ms:.1f} ms")
    return cnt


if __name__ == "__main__":
    which = sys.argv[1:] or ["obj", "big"]
    if "obj" in which:
        scene, cam = rt.models.obj_mesh_scene()
        dt, segs = frame_time(scene, cam)
        print(f"obj-10k frame: {dt*1e3:.1f} ms = {segs/dt/1e6:.1f} Mrays/s")
        counters(scene, cam)
    if "big" in which:
        scene, cam = big_scene()
        dt, segs = frame_time(scene, cam)
        print(f"164k frame: {dt*1e3:.1f} ms = {segs/dt/1e6:.1f} Mrays/s")
        counters(scene, cam)
    if "mesh" in which:
        scene, cam = rt.models.mesh_scene(subdivisions=3)
        dt, segs = frame_time(scene, cam)
        print(f"mesh-1292 frame: {dt*1e3:.1f} ms = "
              f"{segs/dt/1e6:.1f} Mrays/s")
        counters(scene, cam)
