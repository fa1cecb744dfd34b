import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from scratch_r4 import timeit

mscene, mcam = rt.models.mesh_scene(subdivisions=3)
for eng in ("pallas", "pallas_binned", "pallas_sorted"):
    def run(seed, eng=eng):
        return ops_mod.render_linear_fast(mscene, mcam, width=512,
                                          height=512, samples_per_pixel=4,
                                          depth=4, seed=seed, engine=eng)
    img, segs = run(0); jax.block_until_ready(img)
    dt = timeit(run, k=3)
    print(f"mesh_1292 {eng}: {dt*1e3:.1f} ms, {int(segs)/dt/1e6:.1f} "
          f"Mrays/s", flush=True)
