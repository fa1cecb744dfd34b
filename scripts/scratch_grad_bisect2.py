import sys, time, dataclasses
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu.ops import diff as diff_mod

which = sys.argv[1]
scene, cam = rt.models.obj_mesh_scene()
W = H = 256
SPP, D = 8, 4
cull = diff_mod.build_tri_cull(scene) if which == "cull" else None
statics = (W, H, SPP, D, 1, False, False, "pallas", None, cull)

def f(v0):
    s = dataclasses.replace(scene, tri_v0=v0)
    img = diff_mod.render_linear_diff(s, cam, statics)
    return jnp.sum(img * img)

g = jax.jit(jax.grad(f))
t0 = time.perf_counter()
out = g(scene.tri_v0)
jax.block_until_ready(out)
print(f"{which}: grad ok {time.perf_counter()-t0:.1f}s "
      f"norm={float(jnp.linalg.norm(out)):.3e}", flush=True)
