"""OBJ-scale silhouette fit demonstration (VERDICT r3 item 6 'done'
criterion): fit(silhouette=True)-style optimization recovers a rigid
vertex offset of the 10,240-triangle OBJ mesh with importance-selected
edge sampling (the old MAX_EDGE_TRIS hard cap would have excluded this
scene from boundary terms entirely)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import optax
import raytracer_tpu as rt
from raytracer_tpu import grad as gradmod

scene, cam = rt.models.obj_mesh_scene()
assert scene.num_triangles == 10240
W = H = 64
SPP, D = 2, 2
target, _ = rt.render_linear(scene, cam, width=W, height=H,
                             samples_per_pixel=SPP, depth=D, seed=3,
                             parity_plane_sign=False)
params = gradmod.extract_params(scene, ["tri_v0", "tri_v1", "tri_v2"])
true0 = np.asarray(params["tri_v0"]).copy()
off = jnp.asarray([0.06, -0.04, 0.0])
for k in params:
    params[k] = params[k] + off
err0 = float(np.abs(np.asarray(params["tri_v0"]) - true0).max())

# rigid-offset parameterization: dL/dt = sum over vertices of the
# per-vertex gradients (exact chain rule through v_k = v_k0 + t); the
# boundary terms come from the importance-selected edge estimator
from raytracer_tpu.grad.silhouette import value_and_grad_with_silhouette
base = {k: params[k] - off for k in params}   # ground-truth vertices
t_est = jnp.asarray(off)                      # start at the wrong offset
opt = optax.adam(1.5e-2)
state = opt.init(t_est)
losses = []
t0 = time.perf_counter()
for i in range(30):
    cur = {k: base[k] + t_est for k in base}
    loss, grads = value_and_grad_with_silhouette(
        scene, cam, target, cur, width=W, height=H,
        samples_per_pixel=SPP, depth=D, parity_plane_sign=False, seed=3,
        samples_per_edge=4, max_edges=1024)
    g_t = sum(jnp.sum(grads[k], axis=0) for k in base)
    upd, state = opt.update(g_t, state, t_est)
    t_est = optax.apply_updates(t_est, upd)
    losses.append(float(loss))
    if i % 5 == 0:
        print(f"step {i}: loss {losses[-1]:.5e} t={np.asarray(t_est)}",
              flush=True)
err1 = float(np.abs(np.asarray(t_est)).mean())
err0m = float(np.mean(np.abs(off)))
print(f"loss {losses[0]:.4e} -> {losses[-1]:.4e}; mean |v0 err| "
      f"{err0m:.4f} -> {err1:.4f}  ({time.perf_counter()-t0:.0f}s)",
      flush=True)
assert losses[-1] < 0.6 * losses[0]
assert err1 < 0.6 * err0m
print("OBJ silhouette fit: RECOVERED", flush=True)
