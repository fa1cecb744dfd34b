"""Benchmark: rays/sec/chip on the BASELINE north-star config.

Renders the reference's bundled 8-sphere world at 512x512 / 64 spp / 8
bounces on the available accelerator and reports traced ray segments per
second.  "Segments" = actual rays submitted to the intersector (live rays
per bounce summed over the scan) — the honest denominator for a wavefront
tracer, counted on-device by the renderer itself.

Prints ONE JSON line:
  {"metric": ..., "value": rays/s, "unit": "rays/s", "vs_baseline": ...}

vs_baseline: the reference publishes no numbers (BASELINE.md — "None"), so
the yardstick is the BASELINE.json north-star target of 1e9 rays/s on a
v5p-16 (16 chips) == 6.25e7 rays/s/chip; vs_baseline = value / 6.25e7.
"""

import json
import sys
import time

WIDTH = 512
HEIGHT = 512
SPP = 64
DEPTH = 8
PER_CHIP_TARGET = 1e9 / 16.0  # north-star: >1e9 rays/s on v5p-16


def main() -> int:
    import jax
    import numpy as np
    import raytracer_tpu as rt

    world = rt.models.default_world()
    scene = world.to_scene()
    camera = world.to_camera()

    from raytracer_tpu import ops as ops_mod

    def run(seed):
        img, segments = ops_mod.render_linear_fast(
            scene, camera, width=WIDTH, height=HEIGHT,
            samples_per_pixel=SPP, depth=DEPTH, seed=seed)
        return img, segments

    # compile + warmup (first TPU compile is slow; excluded from timing)
    img, segments = run(0)
    img.block_until_ready()
    segments_per_run = int(segments)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        img, segments = run(i + 1)
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays_per_sec = segments_per_run / dt

    result = {
        "metric": f"rays_per_sec_chip_{WIDTH}x{HEIGHT}_{SPP}spp",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / PER_CHIP_TARGET,
    }
    print(json.dumps(result))
    print(
        f"[bench] device={jax.devices()[0].device_kind} "
        f"segments/run={segments_per_run} best={dt:.3f}s "
        f"times={['%.3f' % t for t in times]} "
        f"paths/s={WIDTH*HEIGHT*SPP/dt:.3e}",
        file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
