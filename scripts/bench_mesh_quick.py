"""Quick mesh-row bench: the three triangle configs from bench.py only."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import importlib
import bench as benchmod
import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod

PER_CHIP_TARGET = benchmod.PER_CHIP_TARGET
_time_best = benchmod._time_best

which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {
    "mesh", "obj", "big"}

if "mesh" in which:
    mscene, mcam = rt.models.mesh_scene(subdivisions=3)
    def run_ms(seed):
        return ops_mod.render_linear_fast(
            mscene, mcam, width=512, height=512, samples_per_pixel=4,
            depth=4, seed=seed)
    dt, (_, segs) = _time_best(run_ms)
    r = int(segs) / dt
    print(f"mesh_{mscene.num_triangles}tri: {r/1e6:.2f} Mrays/s "
          f"({r/PER_CHIP_TARGET:.3f}x) frame={dt*1e3:.2f} ms", flush=True)
    ops_mod.flush_binned_overflow_checks()

if "obj" in which:
    oscene, ocam = rt.models.obj_mesh_scene()
    def run_obj(seed):
        return ops_mod.render_linear_fast(
            oscene, ocam, width=512, height=512, samples_per_pixel=4,
            depth=4, seed=seed)
    dt, (_, segs) = _time_best(run_obj)
    r = int(segs) / dt
    print(f"obj_{oscene.num_triangles}tri: {r/1e6:.2f} Mrays/s "
          f"({r/PER_CHIP_TARGET:.3f}x) frame={dt*1e3:.2f} ms", flush=True)
    ops_mod.flush_binned_overflow_checks()

if "big" in which:
    from raytracer_tpu.models.builders import icosphere_mesh
    from raytracer_tpu.scene import DIFFUSE, METAL, build_materials, \
        build_scene
    btris = (icosphere_mesh((-0.6, 0.0, -1.4), 0.45, 0, 6)
             + icosphere_mesh((0.6, 0.0, -1.2), 0.45, 2, 6))
    bmats = build_materials([(DIFFUSE, (0.7, 0.3, 0.3), 0.0, 1.0),
                             (DIFFUSE, (0.8, 0.8, 0.0), 0.0, 1.0),
                             (METAL, (0.85, 0.85, 0.9), 0.05, 1.0)])
    bscene = build_scene([((0.0, -100.5, -1.0), 100.0, 1)], btris, bmats,
                         exact_planes=True)
    bcam = rt.Camera.new_at((0.0, 0.0, 0.0), 1.77778)
    def run_big(seed):
        return ops_mod.render_linear_fast(
            bscene, bcam, width=512, height=512, samples_per_pixel=4,
            depth=4, seed=seed)
    dt, (_, segs) = _time_best(run_big)
    r = int(segs) / dt
    print(f"big_{bscene.num_triangles}tri: {r/1e6:.2f} Mrays/s "
          f"({r/PER_CHIP_TARGET:.3f}x) frame={dt*1e3:.2f} ms", flush=True)
    ops_mod.flush_binned_overflow_checks()
