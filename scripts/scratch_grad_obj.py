import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu import grad as gradmod
from scratch_r4 import timeit

scene, cam = rt.models.obj_mesh_scene()
W = H = 256
SPP, D = 8, 4
from raytracer_tpu import ops as ops_mod
target, _ = ops_mod.render_linear_fast(scene, cam, width=W, height=H,
                                       samples_per_pixel=SPP, depth=D,
                                       seed=0)
params = gradmod.extract_params(scene, ["tri_v0", "mat_color"])
for engine in ("pallas",):
    loss = gradmod.make_loss_fn(scene, cam, target, width=W, height=H,
                                samples_per_pixel=SPP, depth=D, seed=1,
                                parity_plane_sign=False, engine=engine)
    vg = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    out = vg(params)
    jax.block_until_ready(out)
    print(f"{engine}: compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={float(out[0]):.3e}", flush=True)
    dt = timeit(lambda s: vg(params), k=2)
    paths = W * H * SPP
    print(f"{engine}: {dt*1e3:.1f} ms/step -> {paths/dt/1e6:.2f} Mpaths/s",
          flush=True)
