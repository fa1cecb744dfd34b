"""Binned engine on real TPU: correctness vs sorted + speed on OBJ/164k."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_binned as wbn
from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order
from scratch_r4 import big_scene, timeit

for name, (scene, cam) in [("obj10k", rt.models.obj_mesh_scene()),
                           ("big164k", big_scene())]:
    (sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
    tables = list(sorted_t)
    cv = wf.camera_vec(cam)
    order, keys = sorted_top_order(np.asarray(tables[4]),
                                   np.asarray(cam.origin))
    def run(seed, depth=4):
        return wbn.render_linear_pallas_binned(
            sph, *tables, cv, width=512, height=512, samples_per_pixel=4,
            depth=depth, seed=seed, sph_clusters=sph_cl,
            top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
    t0 = time.perf_counter()
    img, segs = run(0)
    jax.block_until_ready(img)
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    # correctness vs current fast engine
    ref, seg_ref = ops_mod.render_linear_fast(
        scene, cam, width=512, height=512, samples_per_pixel=4, depth=4,
        seed=0)
    d = np.abs(np.asarray(ref) - np.asarray(img))
    print(f"{name}: median {np.median(d):.2e} frac>1e-4 {(d>1e-4).mean():.4f} "
          f"segs {int(segs)} ref {int(seg_ref)}", flush=True)
    dt = timeit(run, k=2)
    print(f"{name}: {dt*1e3:.1f} ms/frame -> {int(segs)/dt/1e6:.1f} Mrays/s",
          flush=True)
