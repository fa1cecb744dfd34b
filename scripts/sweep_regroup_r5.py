"""OBJ-10k / 164k regroup-granularity sweep (round 5).

The round-5 profile shows the OBJ frame is glue-dominated: ~13 ms of
triangle grind inside 65 ms.  Per-ray regroups (argsort + 16-plane
gather at 1M rays) are the prime suspect.  This sweep times the engine
at gran=1 (today), 16, and 128 (row takes) with caps autotuned per
variant, and checks overflow + image agreement.
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


def setup(scene, cam):
    (sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
    cv = wf.camera_vec(cam)
    order, keys = sorted_top_order(np.asarray(sorted_t[4]),
                                   np.asarray(cam.origin))
    return sph, sph_cl, sorted_t, cv, jnp.asarray(order), jnp.asarray(keys)


def time_variant(fn, k=8):
    out = fn(0)
    jax.block_until_ready(out)
    out = fn(0)
    jax.block_until_ready(out)
    times = []
    for t in range(3):
        t0 = time.perf_counter()
        outs = [fn(1 + 100 * t + i) for i in range(k)]
        jax.block_until_ready(outs)
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn(50 + 100 * t + i) for i in range(2 * k)]
        jax.block_until_ready(outs)
        t2k = time.perf_counter() - t0
        times.append(max(t2k - tk, 1e-9) / k)
    return min(times), outs[-1]


def sweep(scene, cam, label, W=512, H=512, spp=4, depth=4):
    sph, sph_cl, sorted_t, cv, order, keys = setup(scene, cam)
    n_tris = int(np.sum(np.asarray(scene.tri_valid)))
    br = 32 if n_tris < 4096 else 16
    common = dict(width=W, height=H, samples_per_pixel=spp, depth=depth,
                  sph_clusters=sph_cl, block_rows=br, top_order=order,
                  top_keys=keys)
    ref_img = None
    for rrb, gran in ((depth - 1, 16), (0, 16), (0, 128)):
        tag = f"rrb={rrb} gran={gran}"
        # probe alive counts (uncapped) for this variant's packing
        mean, segs, alive = wbn.render_linear_pallas_binned(
            sph, *sorted_t, cv, seed=0, return_alive=True,
            ray_regroup_bounces=rrb, regroup_granularity=gran, **common)
        counts = np.asarray(alive)[1:]
        caps = tuple(max(16, -(-int(-(-c * 1.3 // 128)) // 16) * 16)
                     for c in counts)
        if ref_img is None:
            ref_img = np.asarray(mean)
        else:
            d = np.abs(np.asarray(mean) - ref_img)
            print(f"  {tag}: img max-diff {d.max():.2e} "
                  f"frac>1e-3 {(d > 1e-3).mean():.1e}")

        def run(seed, rrb=rrb, gran=gran, caps=caps):
            return wbn.render_linear_pallas_binned(
                sph, *sorted_t, cv, seed=seed, bounce_caps=caps,
                ray_regroup_bounces=rrb, regroup_granularity=gran,
                **common)
        dt, out = time_variant(run)
        ovf = float(out[2])
        print(f"  {tag}: {dt*1e3:6.1f} ms  {int(out[1])/dt/1e6:6.1f} "
              f"Mrays/s  caps={caps} overflow={ovf}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["obj"]
    if "obj" in which:
        scene, cam = rt.models.obj_mesh_scene()
        print("obj-10k:")
        sweep(scene, cam, "obj")
    if "big" in which:
        from profile_binned_r5 import big_scene
        scene, cam = big_scene()
        print("164k:")
        sweep(scene, cam, "big")
