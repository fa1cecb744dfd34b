import sys, time, dataclasses
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu.ops import diff as diff_mod
from raytracer_tpu.grad.params import apply_params
from raytracer_tpu import grad as gradmod

scene, cam = rt.models.obj_mesh_scene()
W = H = 256
SPP, D = 8, 4
cull = diff_mod.build_tri_cull(scene)
statics = (W, H, SPP, D, 1, False, False, "pallas", None, cull)
params = gradmod.extract_params(scene, ["tri_v0", "mat_color"])

def f(params):
    s = apply_params(scene, params)
    img = diff_mod.render_linear_diff(s, cam, statics)
    return jnp.sum(img * img)

g = jax.jit(jax.grad(f))
t0 = time.perf_counter()
out = g(params)
jax.block_until_ready(out)
print(f"both-params grad ok {time.perf_counter()-t0:.1f}s", flush=True)
