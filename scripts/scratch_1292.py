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
from scratch_r4 import timeit

scene, cam = rt.models.mesh_scene(subdivisions=3)
(sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
cv = wf.camera_vec(cam)
order, keys = sorted_top_order(np.asarray(sorted_t[4]),
                               np.asarray(cam.origin))
caps = None
for br in (32,):
    def run(seed, br=br, caps_l=None):
        import os
        kw = dict(width=512, height=512, samples_per_pixel=4, depth=4,
                  seed=seed, sph_clusters=sph_cl,
                  ray_regroup_bounces=int(os.environ.get("RRB", "3")),
                  regroup_granularity=int(os.environ.get("GRAN", "16")),
                  block_rows=br, top_order=jnp.asarray(order),
                  top_keys=jnp.asarray(keys))
        if caps_l:
            kw["bounce_caps"] = caps_l
        return wbn.render_linear_pallas_binned(sph, *sorted_t, cv, **kw)
    import os
    _, _, alive = wbn.render_linear_pallas_binned(
        sph, *sorted_t, cv, width=512, height=512, samples_per_pixel=4,
        depth=4, seed=0, sph_clusters=sph_cl,
        ray_regroup_bounces=int(os.environ.get("RRB", "3")),
        regroup_granularity=int(os.environ.get("GRAN", "16")),
        block_rows=br, return_alive=True,
        top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
    counts = np.asarray(alive)[1:]
    caps_l = tuple(int(max(br, -(-int(c * 1.3) // (128 * br)) * br))
                   for c in counts)
    def run2(seed, br=br, caps_l=caps_l):
        out = run(seed, br, caps_l)
        return out[:2]
    img, segs = run2(0); jax.block_until_ready(img)
    dt = timeit(run2, k=3)
    print(f"mesh1292 br={br} caps={caps_l}: {dt*1e3:.1f} ms -> "
          f"{int(segs)/dt/1e6:.1f} Mrays/s", flush=True)
