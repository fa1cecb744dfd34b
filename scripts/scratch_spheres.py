import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from scratch_r4 import timeit

scene, cam = rt.models.random_spheres()
def run(seed):
    return ops_mod.render_linear_fast(scene, cam, width=512, height=512,
                                      samples_per_pixel=16, depth=8,
                                      seed=seed)
img, segs = run(0); jax.block_until_ready(img)
dt = timeit(run, k=3)
print(f"random_spheres: {dt*1e3:.1f} ms, {int(segs)/dt/1e6:.1f} Mrays/s "
      f"(target 62.5)", flush=True)

mscene, mcam = rt.models.mesh_scene(subdivisions=3)
def run_m(seed):
    return ops_mod.render_linear_fast(mscene, mcam, width=512, height=512,
                                      samples_per_pixel=4, depth=4,
                                      seed=seed)
img, segs = run_m(0); jax.block_until_ready(img)
dt = timeit(run_m, k=3)
print(f"mesh_1292: {dt*1e3:.1f} ms, {int(segs)/dt/1e6:.1f} Mrays/s "
      f"(target 62.5)", flush=True)

world = rt.models.default_world()
dscene, dcam = world.to_scene(), world.to_camera()
def run_h(seed):
    return ops_mod.render_linear_fast(dscene, dcam, width=512, height=512,
                                      samples_per_pixel=64, depth=8,
                                      seed=seed)
img, segs = run_h(0); jax.block_until_ready(img)
dt = timeit(run_h, k=3)
print(f"headline: {dt*1e3:.1f} ms, {int(segs)/dt/1e6:.1f} Mrays/s",
      flush=True)
