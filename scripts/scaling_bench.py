"""Multi-device scaling measurement (BASELINE: >=85% scaling efficiency).

On real multi-chip hardware this measures rays/s at 1..N chips over ICI.
Without it (this container sees ONE chip), run on the virtual CPU mesh to
validate the harness and the sharding math:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py cpu

Prints one JSON line per device count with parallel efficiency vs 1 device.
"""

import json
import os
import sys
import time


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import raytracer_tpu as rt
    from raytracer_tpu import parallel

    world = rt.models.default_world()
    scene = world.to_scene()
    cam = world.to_camera()
    ndev = len(jax.devices())
    W, H, SPP, D = 512, 256, 8, 8

    base_rate = None
    counts = [n for n in (1, 2, 4, 8, 16) if n <= ndev]
    for n in counts:
        mesh = parallel.make_mesh(n)

        def run(seed):
            return parallel.render_linear_sharded(
                scene, cam, mesh=mesh, width=W, height=H,
                samples_per_pixel=SPP, depth=D, seed=seed)

        img, segs = run(0)
        jax.block_until_ready(img)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            img, s = run(i + 1)
            jax.block_until_ready(img)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rate = int(segs) / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(json.dumps({
            "metric": f"scaling_rays_per_sec_{n}dev",
            "value": rate, "unit": "rays/s",
            "devices": n, "efficiency_vs_1dev": eff,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
