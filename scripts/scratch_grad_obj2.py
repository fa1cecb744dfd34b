import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu import grad as gradmod
from raytracer_tpu.ops import diff as diff_mod

scene, cam = rt.models.obj_mesh_scene()
W = H = 64
SPP, D = 2, 2
target, _ = rt.render_linear(scene, cam, width=W, height=H,
                             samples_per_pixel=SPP, depth=D, seed=0,
                             parity_plane_sign=False)
params = gradmod.extract_params(scene, ["tri_v0", "mat_color"])
loss = gradmod.make_loss_fn(scene, cam, target, width=W, height=H,
                            samples_per_pixel=SPP, depth=D, seed=1,
                            parity_plane_sign=False, engine="pallas")
vg = jax.jit(jax.value_and_grad(loss))
t0 = time.perf_counter()
out = vg(params)
jax.block_until_ready(out)
print(f"64x64 spp2 d2 pallas grad OK {time.perf_counter()-t0:.1f}s "
      f"loss={float(out[0]):.3e}", flush=True)
