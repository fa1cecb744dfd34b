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
from scratch_r4 import big_scene, timeit

name = sys.argv[1]
scene, cam = (rt.models.obj_mesh_scene() if name == "obj"
              else big_scene())
(sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
cv = wf.camera_vec(cam)
order, keys = sorted_top_order(np.asarray(sorted_t[4]),
                               np.asarray(cam.origin))
for br in (16, 32):
    _, _, alive = wbn.render_linear_pallas_binned(
        sph, *sorted_t, cv, width=512, height=512, samples_per_pixel=4,
        depth=4, seed=0, sph_clusters=sph_cl, ray_regroup_bounces=3,
        block_rows=br, return_alive=True,
        top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
    counts = np.asarray(alive)[1:]
    caps_l = tuple(int(max(br, -(-int(c * 1.3) // (128 * br)) * br))
                   for c in counts)
    def run2(seed, br=br, caps_l=caps_l):
        out = wbn.render_linear_pallas_binned(
            sph, *sorted_t, cv, width=512, height=512,
            samples_per_pixel=4, depth=4, seed=seed, sph_clusters=sph_cl,
            ray_regroup_bounces=3, block_rows=br, bounce_caps=caps_l,
            top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
        return out[:2]
    img, segs = run2(0); jax.block_until_ready(img)
    dt = timeit(run2, k=3)
    print(f"{name} br={br}: {dt*1e3:.1f} ms -> "
          f"{int(segs)/dt/1e6:.1f} Mrays/s", flush=True)
