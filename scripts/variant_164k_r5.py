"""164k bounce-1 kernel cost isolation: depth=2 frame time across engine
variants (selection mode, node-exit, block size, DMA granularity)."""
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
from depth_sweep_r5 import time_variant


def main():
    scene, cam = big_scene()
    (sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
    cv = wf.camera_vec(cam)
    order, keys = sorted_top_order(np.asarray(sorted_t[4]),
                                   np.asarray(cam.origin))
    common = dict(width=512, height=512, samples_per_pixel=4,
                  sph_clusters=sph_cl,
                  top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
    _, _, alive = wbn.render_linear_pallas_binned(
        sph, *sorted_t, cv, seed=0, depth=2, block_rows=16,
        return_alive=True, ray_regroup_bounces=1, **common)
    counts = np.asarray(alive)[1:]
    caps = tuple(max(16, -(-int(-(-c * 1.3 // 128)) // 16) * 16)
                 for c in counts)
    print("caps:", caps)

    variants = [
        ("base br16 super", dict(block_rows=16)),
        ("flat selection", dict(block_rows=16, super_selection=False)),
        ("no node_exit", dict(block_rows=16, node_exit=False)),
        ("br8", dict(block_rows=8)),
        ("br32", dict(block_rows=32)),
        ("depth1 baseline", dict(block_rows=16, depth=1)),
    ]
    for name, kw in variants:
        depth = kw.pop("depth", 2)

        def run(seed, kw=kw, depth=depth):
            return wbn.render_linear_pallas_binned(
                sph, *sorted_t, cv, seed=seed, depth=depth,
                bounce_caps=caps if depth > 1 else None,
                ray_regroup_bounces=depth - 1, **kw, **common)
        dt = time_variant(run)
        print(f"  {name:<18}: {dt*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
