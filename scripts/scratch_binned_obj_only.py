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

cfgs = [("obj10k", rt.models.obj_mesh_scene())]
if len(sys.argv) > 1 and sys.argv[1] == "big":
    cfgs = [("big164k", big_scene())]
for name, (scene, cam) in cfgs:
    (sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
    tables = list(sorted_t)
    cv = wf.camera_vec(cam)
    order, keys = sorted_top_order(np.asarray(tables[4]),
                                   np.asarray(cam.origin))
    def run(seed):
        return wbn.render_linear_pallas_binned(
            sph, *tables, cv, width=512, height=512,
            samples_per_pixel=4, depth=4, seed=seed,
            sph_clusters=sph_cl, ray_regroup_bounces=3,
            top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
    img, segs = run(0); jax.block_until_ready(img)
    dt = timeit(run, k=3)
    print(f"{name}: {dt*1e3:.1f} ms -> {int(segs)/dt/1e6:.1f} Mrays/s",
          flush=True)
