"""164k: does a finer top granularity (fewer groups per top) tighten the
block-union grind?  Monkeypatches wavefront_sorted.TOP_GROUPS before
table build (the walk kernel reads top group-ranges, so it is top-size
agnostic); measures depth=2 and depth=4 frame time + walk counters."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

import raytracer_tpu as rt
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_sorted as wso
from raytracer_tpu.ops.pallas import wavefront_binned as wbn
from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order
from profile_binned_r5 import big_scene
from depth_sweep_r5 import time_variant


def run_config(scene, cam, top_groups, depth=4):
    wso.TOP_GROUPS = top_groups
    wso.TOP_SPAN = top_groups * wso.GROUP
    scene_h = jax.device_get(scene)
    sorted_t = tuple(jnp.asarray(t)
                     for t in wso.build_tri_sorted_tables(scene_h))
    sph = jnp.asarray(wf.pack_spheres(scene_h))
    cv = wf.camera_vec(cam)
    order, keys = sorted_top_order(np.asarray(sorted_t[4]),
                                   np.asarray(cam.origin))
    n_tops = sorted_t[4].shape[1]
    common = dict(width=512, height=512, samples_per_pixel=4,
                  block_rows=16, top_order=jnp.asarray(order),
                  top_keys=jnp.asarray(keys))
    _, _, alive = wbn.render_linear_pallas_binned(
        sph, *sorted_t, cv, seed=0, depth=depth, return_alive=True,
        ray_regroup_bounces=depth - 1, **common)
    counts = np.asarray(alive)[1:]
    caps = tuple(max(16, -(-int(-(-c * 1.3 // 128)) // 16) * 16)
                 for c in counts)

    def run(seed):
        return wbn.render_linear_pallas_binned(
            sph, *sorted_t, cv, seed=seed, depth=depth, bounce_caps=caps,
            ray_regroup_bounces=depth - 1, **common)
    dt = time_variant(run)
    _, _, cnt = wbn.render_linear_pallas_binned(
        sph, *sorted_t, cv, seed=0, depth=depth,
        ray_regroup_bounces=depth - 1, debug_counts=True, **common)
    cnt = np.asarray(cnt)
    tot = cnt.sum(axis=(0, 1))
    print(f"TOP_GROUPS={top_groups}: n_tops={n_tops} depth={depth} "
          f"{dt*1e3:6.1f} ms | runs={tot[0]} tops={tot[1]} grps={tot[2]} "
          f"subs={tot[3]} tris={tot[4]}")


if __name__ == "__main__":
    scene, cam = big_scene()
    for tg in (8, 4, 2):
        run_config(scene, cam, tg)
