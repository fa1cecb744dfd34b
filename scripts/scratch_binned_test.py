"""Quick interpret-mode check of the binned engine vs XLA path (CPU)."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_sorted as wso
from raytracer_tpu.ops.pallas import wavefront_binned as wbn
from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order

scene, cam = rt.models.mesh_scene(subdivisions=2)
tables = [jnp.asarray(t) for t in wso.build_tri_sorted_tables(scene)]
sph = jnp.asarray(wf.pack_spheres(scene))
W, H, SPP, D = 48, 32, 2, 3
order, keys = sorted_top_order(np.asarray(tables[4]), np.asarray(cam.origin))
got, seg = wbn.render_linear_pallas_binned(
    sph, *tables, wf.camera_vec(cam), width=W, height=H,
    samples_per_pixel=SPP, depth=D, interpret=True,
    top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
ref, seg_ref = rt.render_linear(scene, cam, width=W, height=H,
                                samples_per_pixel=SPP, depth=D,
                                parity_plane_sign=False)
d = np.abs(np.asarray(ref) - np.asarray(got))
print("median", np.median(d), "frac>1e-4", (d > 1e-4).mean(),
      "max", d.max())
print("segs", int(seg), "ref", int(seg_ref))
