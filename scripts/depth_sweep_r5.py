"""Per-bounce cost isolation: frame time at depth=1..4 on the mesh
configs; the increments separate pass-kernel cost from regroup glue."""
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
from profile_binned_r5 import big_scene


def time_variant(fn, k=8):
    out = fn(0)
    jax.block_until_ready(out)
    out = fn(0)
    jax.block_until_ready(out)
    times = []
    for t in range(3):
        t0 = time.perf_counter()
        outs = [fn(1 + 100 * t + i) for i in range(k)]
        jax.block_until_ready(outs)
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn(50 + 100 * t + i) for i in range(2 * k)]
        jax.block_until_ready(outs)
        t2k = time.perf_counter() - t0
        times.append(max(t2k - tk, 1e-9) / k)
    return min(times)


def sweep(scene, cam, W=512, H=512, spp=4):
    (sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
    cv = wf.camera_vec(cam)
    order, keys = sorted_top_order(np.asarray(sorted_t[4]),
                                   np.asarray(cam.origin))
    n_tris = int(np.sum(np.asarray(scene.tri_valid)))
    br = 32 if n_tris < 4096 else 16
    common = dict(width=W, height=H, samples_per_pixel=spp,
                  sph_clusters=sph_cl, block_rows=br,
                  top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
    # caps from a depth-4 probe, reused prefix-wise at lower depths
    _, _, alive = wbn.render_linear_pallas_binned(
        sph, *sorted_t, cv, seed=0, depth=4, return_alive=True,
        ray_regroup_bounces=3, **common)
    counts = np.asarray(alive)[1:]
    caps4 = tuple(max(16, -(-int(-(-c * 1.3 // 128)) // 16) * 16)
                  for c in counts)
    prev = 0.0
    for depth in (1, 2, 3, 4):
        caps = caps4[:depth - 1]

        def run(seed, depth=depth, caps=caps):
            return wbn.render_linear_pallas_binned(
                sph, *sorted_t, cv, seed=seed, depth=depth,
                bounce_caps=caps if caps else None,
                ray_regroup_bounces=depth - 1, **common)
        dt = time_variant(run)
        print(f"  depth={depth}: {dt*1e3:6.1f} ms  (+{(dt-prev)*1e3:5.1f})"
              f"  cap_rows={caps}")
        prev = dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["big"]
    if "obj" in which:
        scene, cam = rt.models.obj_mesh_scene()
        print("obj-10k:")
        sweep(scene, cam)
    if "big" in which:
        scene, cam = big_scene()
        print("164k:")
        sweep(scene, cam)
