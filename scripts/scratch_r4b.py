import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from scratch_r4 import big_scene, timeit

scene, cam = big_scene()
prev = 0.0
for depth in (1, 2, 4):
    def run(seed):
        return ops_mod.render_linear_fast(
            scene, cam, width=512, height=512, samples_per_pixel=4,
            depth=depth, seed=seed)
    dt = timeit(run, k=2)
    _, segs = run(0)
    print(f"big164k depth={depth}: {dt*1e3:.1f} ms (prev {prev*1e3:.1f}) segs={int(segs)}", flush=True)
    prev = dt
