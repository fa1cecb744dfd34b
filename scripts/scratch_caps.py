import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from scratch_r4 import big_scene, timeit

cfgs = [("obj10k", rt.models.obj_mesh_scene())]
if len(sys.argv) > 1 and sys.argv[1] == "big":
    cfgs = [("big164k", big_scene())]
for name, (scene, cam) in cfgs:
    def run(seed):
        return ops_mod.render_linear_fast(
            scene, cam, width=512, height=512, samples_per_pixel=4,
            depth=4, seed=seed)
    img0, segs0 = run(0)
    jax.block_until_ready(img0)
    print(f"{name}: caps={list(ops_mod._BINNED_CAPS.values())}", flush=True)
    img1, segs1 = run(0)   # capped render, same seed
    d = float(jnp.max(jnp.abs(img0 - img1)))
    print(f"{name}: capped-vs-uncapped same-seed max diff {d:.2e} "
          f"segs {int(segs0)} vs {int(segs1)}", flush=True)
    dt = timeit(run, k=3)
    print(f"{name}: {dt*1e3:.1f} ms -> {int(segs1)/dt/1e6:.1f} Mrays/s "
          f"(overflowing={ops_mod.flush_binned_overflow_checks()})",
          flush=True)
