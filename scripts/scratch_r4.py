"""Round-4 scratch measurements: where does the sorted engine's time go?"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_sorted as wso
from raytracer_tpu.models.builders import icosphere_mesh
from raytracer_tpu.scene import DIFFUSE, METAL, build_materials, build_scene


def big_scene():
    btris = (icosphere_mesh((-0.6, 0.0, -1.4), 0.45, 0, 6)
             + icosphere_mesh((0.6, 0.0, -1.2), 0.45, 2, 6))
    bmats = build_materials([(DIFFUSE, (0.7, 0.3, 0.3), 0.0, 1.0),
                             (DIFFUSE, (0.8, 0.8, 0.0), 0.0, 1.0),
                             (METAL, (0.85, 0.85, 0.9), 0.05, 1.0)])
    bscene = build_scene([((0.0, -100.5, -1.0), 100.0, 1)], btris, bmats,
                         exact_planes=True)
    bcam = rt.Camera.new_at((0.0, 0.0, 0.0), 1.77778)
    return bscene, bcam


def timeit(fn, k=4):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(i + 1) for i in range(k)]
    jax.block_until_ready(outs)
    t1 = time.perf_counter()
    outs2 = [fn(i + 10) for i in range(2 * k)]
    jax.block_until_ready(outs2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / k


def main():
    # ---- sort cost at 1M ----
    N = 1 << 20
    key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 30,
                             dtype=jnp.int32)
    state = jax.random.normal(jax.random.PRNGKey(1), (15, N), jnp.float32)

    @jax.jit
    def sort_gather(key, state, s):
        order = jnp.argsort(key + s)
        return state[:, order]

    dt = timeit(lambda s: sort_gather(key, state, s))
    print(f"argsort+gather15 1M: {dt*1e3:.2f} ms")

    @jax.jit
    def sort_only(key, s):
        return jnp.argsort(key + s)

    dt = timeit(lambda s: sort_only(key, s))
    print(f"argsort-only 1M: {dt*1e3:.2f} ms")

    # ---- current engines ----
    for name, (scene, cam), spp, depth in [
            ("obj10k", rt.models.obj_mesh_scene(), 4, 4),
            ("big164k", big_scene(), 4, 4)]:
        eng, pps, _ = ops_mod.resolve_dispatch(scene, None)
        def run(seed):
            return ops_mod.render_linear_fast(
                scene, cam, width=512, height=512, samples_per_pixel=spp,
                depth=depth, seed=seed)
        dt = timeit(run, k=2)
        _, segs = run(0)
        segs = int(segs)
        print(f"{name}: engine={eng} {dt*1e3:.1f} ms/frame, segs={segs}, "
              f"{segs/dt/1e6:.1f} Mrays/s")

    # ---- walk counters on the sorted engine (164k) ----
    scene, cam = big_scene()
    (sph, sph_cl, tri_hbm, subb, subn, grpb, topb, topr, root,
     refp, norder, nkeys, nrunb, klo, khi) = ops_mod.scene_sorted_tables(
        scene)
    cv = wf.camera_vec(cam)
    from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order
    order, keys = sorted_top_order(np.asarray(topb), np.asarray(cam.origin))
    out = wso.render_linear_pallas_sorted(
        sph, tri_hbm, subb, subn, grpb, topb, topr, root,
        refp, norder, nkeys, nrunb, klo, khi, cv,
        width=512, height=512, samples_per_pixel=4, depth=4, seed=0,
        sph_clusters=sph_cl, top_order=jnp.asarray(order),
        top_keys=jnp.asarray(keys), debug_counts=True)
    mean, segs, counts = out
    counts = np.asarray(counts)  # (depth, nblocks, 5)
    n_tops = topb.shape[1]
    print(f"n_tops={n_tops}, n_blocks={counts.shape[1]}")
    for b in range(counts.shape[0]):
        c = counts[b]
        print(f" bounce {b}: runs={c[:,0].mean():.1f} tops={c[:,1].mean():.1f} "
              f"grps={c[:,2].mean():.1f} subs={c[:,3].mean():.1f} "
              f"tris={c[:,4].mean():.0f} (max tris={c[:,4].max()})")


if __name__ == "__main__":
    main()
