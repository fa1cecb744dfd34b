"""On-device check: fused Pallas kernel vs XLA wavefront path."""

import sys
import time

import jax
import numpy as np
import jax.numpy as jnp

import raytracer_tpu as rt
from raytracer_tpu.ops.pallas import wavefront as wf


def compare(world, W, H, spp, depth, label):
    scene = world.to_scene()
    cam = world.to_camera()
    sph = jnp.asarray(wf.pack_spheres(scene))
    tri = jnp.asarray(wf.pack_triangles(scene))
    cv = wf.camera_vec(cam)

    img_ref, segs_ref = rt.render_linear(
        scene, cam, width=W, height=H, samples_per_pixel=spp, depth=depth,
        seed=0)
    img_ref = np.asarray(img_ref)

    img_p, segs_p = wf.render_linear_pallas(
        sph, tri, cv, width=W, height=H, samples_per_pixel=spp, depth=depth,
        seed=0)
    img_p = np.asarray(img_p)

    err = np.abs(img_ref - img_p)
    print(f"[{label}] {W}x{H}x{spp}spp d{depth}: max|err|={err.max():.3e} "
          f"mean={err.mean():.3e} segs ref={int(segs_ref)} "
          f"pallas={int(segs_p)}", flush=True)
    return err.max()


def bench_pallas(world, W, H, spp, depth, block_rows=32):
    scene = world.to_scene()
    cam = world.to_camera()
    sph = jnp.asarray(wf.pack_spheres(scene))
    tri = jnp.asarray(wf.pack_triangles(scene))
    cv = wf.camera_vec(cam)

    def run(seed):
        return wf.render_linear_pallas(
            sph, tri, cv, width=W, height=H, samples_per_pixel=spp,
            depth=depth, seed=seed, block_rows=block_rows)

    img, segs = run(0)
    jax.block_until_ready(img)
    segs = float(segs)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        img, s = run(i + 1)
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"[pallas bench] {W}x{H}x{spp}spp d{depth} R={block_rows}: "
          f"{dt:.3f}s  {segs/dt/1e6:.1f} Mrays/s "
          f"({W*H*spp/dt:.3e} paths/s)", flush=True)


if __name__ == "__main__":
    w = rt.models.default_world()
    compare(w, 64, 36, 4, 4, "default")
    wt = rt.models.ffi_example_world()
    compare(wt, 64, 64, 2, 4, "triangles")
    bench_pallas(w, 512, 512, 64, 8, block_rows=32)
    bench_pallas(w, 512, 512, 64, 8, block_rows=128)
