"""Ablation: where does the OBJ-10k binned frame actually spend time?

Times render_linear_fast (the production capped path) with
wavefront_binned._regroup monkeypatched:
  prod      — payload-sort regroup (current production)
  argsortg  — old argsort + 15-plane gather formulation
  identity  — no regroup at all (WRONG image; isolates regroup cost)
  sortonly  — sort keys, discard permutation (state unchanged; isolates
              the sort vs the payload movement)
Also depth sweep 1..4 for marginal bounce cost.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax.numpy as jnp
import jax
import bench as benchmod
import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from raytracer_tpu.ops.pallas import wavefront_binned as wbn

_time_best = benchmod._time_best

oscene, ocam = rt.models.obj_mesh_scene()
which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {
    "prod", "identity", "depth"}

prod_regroup = wbn._regroup


def regroup_identity(state, keys, gran):
    return state


def regroup_argsortg(state, keys, gran):
    P, rows, lanes = state.shape
    order = jnp.argsort(keys.reshape(-1))
    return state.reshape(P, -1)[:, order].reshape(P, rows, lanes)


def regroup_sortonly(state, keys, gran):
    P, rows, lanes = state.shape
    k = jax.lax.sort([keys.reshape(-1)], num_keys=1)[0]
    return state + (k[0] * 0).astype(state.dtype)


import numpy as np
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order

(sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(oscene)
cv = wf.camera_vec(ocam)
cam_np = np.concatenate([
    np.asarray(ocam.origin, np.float32),
    np.asarray(ocam.lower_left_corner, np.float32),
    np.asarray(ocam.horizontal, np.float32),
    np.asarray(ocam.vertical, np.float32)])
t_order, t_keys = sorted_top_order(np.asarray(sorted_t[4]), cam_np[:3])
t_order, t_keys = jnp.asarray(t_order), jnp.asarray(t_keys)


def bench(tag, depth=4):
    # UNCAPPED direct engine call: every bounce runs full-size, so the
    # regroup variants are shape-identical and the ablation is clean.
    # The jit cache must drop between variants (the monkeypatched
    # _regroup is baked in at trace time)
    wbn.render_linear_pallas_binned.clear_cache()

    def run(seed):
        return wbn.render_linear_pallas_binned(
            sph, *sorted_t, cv, seed=seed, samples_per_pixel=4,
            width=512, height=512, depth=depth, sph_clusters=sph_cl,
            block_rows=16, ray_regroup_bounces=max(depth - 1, 0),
            top_order=t_order, top_keys=t_keys)
    dt, (_, segs) = _time_best(run)
    print(f"{tag:12s} depth={depth} frame={dt*1e3:7.2f} ms "
          f"rate={int(segs)/dt/1e6:7.2f} Mrays/s", flush=True)
    return dt


if "prod" in which:
    bench("prod")
if "argsortg" in which:
    wbn._regroup = regroup_argsortg
    bench("argsortg")
    wbn._regroup = prod_regroup
if "identity" in which:
    wbn._regroup = regroup_identity
    bench("identity")
    wbn._regroup = prod_regroup
if "sortonly" in which:
    wbn._regroup = regroup_sortonly
    bench("sortonly")
    wbn._regroup = prod_regroup
if "depth" in which:
    for d in (1, 2, 3):
        bench("prod", depth=d)
