"""TPU perf probe: sorted per-bounce engine vs streamed fused kernel.

Usage: python scripts/probe_sorted.py [obj|big|both] [block_rows...]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_stream as ws
from raytracer_tpu.ops.pallas import wavefront_sorted as wso
from raytracer_tpu.models.builders import icosphere_mesh
from raytracer_tpu.scene import DIFFUSE, METAL, build_materials, build_scene
from scripts.perf_study import marginal

W = H = 512
SPP, D = 4, 4


def scenes(which):
    out = []
    if which in ("obj", "both"):
        out.append(("obj_10k",) + rt.models.obj_mesh_scene())
    if which in ("big", "both"):
        tris = (icosphere_mesh((-0.6, 0.0, -1.4), 0.45, 0, 6)
                + icosphere_mesh((0.6, 0.0, -1.2), 0.45, 2, 6))
        mats = build_materials([(DIFFUSE, (0.7, 0.3, 0.3), 0.0, 1.0),
                                (DIFFUSE, (0.8, 0.8, 0.0), 0.0, 1.0),
                                (METAL, (0.85, 0.85, 0.9), 0.05, 1.0)])
        big = build_scene([((0.0, -100.5, -1.0), 100.0, 1)], tris, mats,
                          exact_planes=True)
        cam = rt.Camera.new_at((0.0, 0.0, 0.0), 1.77778)
        out.append(("icospheres_164k", big, cam))
    return out


def main():
    args = sys.argv[1:]
    which = args[0] if args and args[0] in ("obj", "big", "both") else "both"
    brs = [int(a) for a in args if a.isdigit()] or [8]
    for name, scene, cam in scenes(which):
        cv = wf.camera_vec(cam)
        # streamed baseline
        (sph, sph_cl, tri_hbm, leafb, leafn,
         topb, topr, root) = ops_mod.scene_stream_tables(scene)
        so, sk = ws.sorted_top_order(np.asarray(topb), np.asarray(cam.origin))
        so, sk = jnp.asarray(so), jnp.asarray(sk)

        def run_stream(s):
            return ws.render_linear_pallas_stream(
                sph, tri_hbm, leafb, leafn, topb, topr, root, cv,
                width=W, height=H, samples_per_pixel=SPP, depth=D, seed=s,
                sph_clusters=sph_cl, top_order=so, top_keys=sk)
        img0, segs = run_stream(0)
        dt = marginal(run_stream, k=2)
        print(f"{name} stream: {dt*1e3:.1f} ms  "
              f"{int(segs)/dt/1e6:.2f} Mrays/s", flush=True)

        tabs = [jnp.asarray(t) for t in wso.build_tri_sorted_tables(scene)]
        oo, ok_ = wso.sorted_top_order(np.asarray(tabs[4]),
                                       np.asarray(cam.origin))
        oo, ok_ = jnp.asarray(oo), jnp.asarray(ok_)
        for br in brs:
            def run_sorted(s, br=br):
                return wso.render_linear_pallas_sorted(
                    sph, *tabs, cv, width=W, height=H,
                    samples_per_pixel=SPP, depth=D, seed=s, block_rows=br,
                    sph_clusters=sph_cl, top_order=oo, top_keys=ok_)
            img1, segs1 = run_sorted(0)
            d = np.abs(np.asarray(img0) - np.asarray(img1))
            dt = marginal(run_sorted, k=2)
            print(f"{name} sorted(br={br}): {dt*1e3:.1f} ms  "
                  f"{float(segs1)/dt/1e6:.2f} Mrays/s  "
                  f"img: med={np.median(d):.2e} "
                  f"frac>1e-4={(d>1e-4).mean():.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
