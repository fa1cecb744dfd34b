import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu.ops import diff as diff_mod
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_bwd as wb

which = sys.argv[1]
scene, cam = rt.models.obj_mesh_scene()
W = H = 256
SPP, D = 8, 4
cull = diff_mod.build_tri_cull(scene)
sph = diff_mod.pack_spheres_jnp(scene)
tri = diff_mod.pack_triangles_jnp(scene, perm=cull.perm)
tri_cl = (diff_mod.tri_cluster_bounds_jnp(scene, cull),
          jnp.asarray(cull.ranges))
cv = wf.camera_vec(cam)
g = jnp.ones((H, W, 3), jnp.float32) * 1e-3

if which == "fwd":
    @jax.jit
    def f(sph, tri, cv):
        img, segs = wf.render_linear_pallas(
            sph, tri, cv, width=W, height=H, samples_per_pixel=SPP,
            depth=D, seed=1, parity_plane_sign=False, tri_clusters=tri_cl)
        return jnp.sum(img)
    print("fwd:", float(f(sph, tri, cv)), flush=True)
elif which == "bwd":
    @jax.jit
    def f(sph, tri, cv, g):
        dsph, dtri, dcam = wb.render_grad_pallas(
            sph, tri, g, cv, width=W, height=H, samples_per_pixel=SPP,
            depth=D, seed=1, parity_plane_sign=False, tri_clusters=tri_cl)
        return jnp.sum(dsph) + jnp.sum(dtri) + jnp.sum(dcam)
    print("bwd:", float(f(sph, tri, cv, g)), flush=True)
