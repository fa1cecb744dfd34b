"""Scaling-efficiency measurement + committed artifact (SCALING.json).

BASELINE target: >=85% multi-host scaling efficiency.  Real multi-chip
hardware is not reachable from this container (one TPU chip behind a
tunnel), so the efficiency number is built from measurements that ARE
meaningful here, and the harness is written so the same entry points run
unchanged on a real pod slice:

1. ``band`` (real TPU chip, default): per-device wall clock of the EXACT
   per-device program the sharded path runs.  ``render_linear_sharded_fast``
   gives every device one interleaved row subset through the fused Pallas
   kernel (parallel/sharding.py); a multi-chip step's wall clock is
   ``max_i T(band_i)`` + one scalar psum (no other collective exists — the
   image stays sharded, the scene is replicated).  So
   ``efficiency(n) = T(full) / (n * max_i T(band_i))`` measured on one real
   chip is the strong-scaling efficiency the slice would see, up to the
   psum latency (microseconds against multi-ms bands).

   Timing is PIPELINED (8 async dispatches, one block): a pjit'd multi-chip
   step is dispatched once for all chips, so the single-chip-tunnel's
   ~20 ms per-dispatch RPC latency must not be charged to the kernel.
   Efficiency is reported at two workloads — the 512x512x64spp headline
   frame (per-device work at 8 chips ~5 ms, so the kernel's ~3 ms fixed
   cost bites: this is honest Amdahl strong-scaling) and a production
   1024x1024x128spp frame where per-device work is ~20x larger and
   efficiency clears the 85% target.
2. ``cpu`` (8 virtual XLA host devices): validates the sharding math
   end-to-end (the gathered sharded image must be bitwise identical to the
   single-device render — also asserted in tests/test_sharding.py) and
   measures the work-division side of efficiency: per-band traced-segment
   counts -> load-balance efficiency ``mean(segs)/max(segs)``.  Wall-clock
   on the virtual mesh is NOT reported as efficiency: the container has 2
   host cores for 8 devices, so oversubscription noise would swamp it.

Usage:
  python scripts/scaling_bench.py          # band mode on the real chip
  python scripts/scaling_bench.py cpu      # virtual-mesh validation
  python scripts/scaling_bench.py write    # run both-available modes and
                                           # rewrite SCALING.json
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
COUNTS = (1, 2, 4, 8)
W, H, SPP, D = 512, 512, 64, 8  # the headline bench config
CONFIGS = (("headline", 512, 512, 64),
           ("production", 1024, 1024, 128))


def _best(fn, n=3, pipeline=32):
    """Min over n trials of steady-state per-call device time: each trial
    submits ``pipeline`` async dispatches and blocks once, and the reported
    time is the marginal cost (t_2k - t_k) / k so the one remaining tunnel
    round trip cancels exactly — a real pjit step is dispatched once for
    all chips, so per-dispatch RPC latency must not be charged to the
    kernel."""
    import jax
    jax.block_until_ready(fn(0))

    def batch(count, seed0):
        t0 = time.perf_counter()
        outs = [fn(seed0 + i) for i in range(count)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0, outs[-1]

    k = pipeline // 2
    times = []
    for t in range(n):
        tk, _ = batch(k, 1 + t * pipeline)
        t2k, out = batch(2 * k, 1000 + t * pipeline)
        # t(2k) - t(k) cancels the constant per-batch overhead (the one
        # blocking RPC round trip); the difference is k marginal calls
        times.append(max(t2k - tk, 0.0) / k)
    return min(times), out


def band_mode():
    """Per-band kernel timings on the real chip -> strong-scaling model."""
    import jax
    import raytracer_tpu as rt
    from raytracer_tpu import ops as ops_mod
    from raytracer_tpu.ops.pallas import wavefront as wf
    from raytracer_tpu.parallel.mesh import pad_to_multiple

    world = rt.models.default_world()
    scene, cam = world.to_scene(), world.to_camera()
    sph, tri, sph_cl, tri_cl = ops_mod.scene_tables(scene, True)
    cv = wf.camera_vec(cam)

    results = []
    for cfg_name, w, h, spp in CONFIGS:
        def render_band(rows, row0, stride, seed, w=w, h=h, spp=spp):
            return wf.render_linear_pallas(
                sph, tri, cv, width=w, height=h, samples_per_pixel=spp,
                depth=D, seed=seed, parity_plane_sign=True,
                sph_clusters=sph_cl, tri_clusters=tri_cl,
                shard_rows=rows, row_offset=row0, row_stride=stride)

        t_full, (_, segs_full) = _best(lambda s: render_band(h, 0, 1, s))
        results.append({
            "metric": f"{cfg_name}_1dev", "config": cfg_name, "devices": 1,
            "value": int(segs_full) / t_full, "unit": "rays/s",
            "efficiency": 1.0, "t_full_s": t_full,
        })
        counts = COUNTS[1:] if cfg_name == "headline" else (8,)
        for n in counts:
            rows_per = pad_to_multiple(h, n) // n
            for name, offs in (("interleaved",
                                [(i, n) for i in range(n)]),
                               ("contiguous",
                                [(i * rows_per, 1) for i in range(n)])):
                band_ts, band_segs = [], []
                for r0, stride in offs:
                    dt, (_, s) = _best(lambda sd, r0=r0, stride=stride:
                                       render_band(rows_per, r0, stride, sd))
                    band_ts.append(dt)
                    band_segs.append(int(s))
                eff = t_full / (n * max(band_ts))
                results.append({
                    "metric": f"{cfg_name}_{n}dev_{name}",
                    "config": cfg_name, "devices": n,
                    "value": sum(band_segs) / max(band_ts), "unit": "rays/s",
                    "efficiency": eff, "assignment": name,
                    "max_band_s": max(band_ts), "min_band_s": min(band_ts),
                    "load_balance": (sum(band_segs) / n) / max(band_segs),
                })
    return results


def binned_band_mode():
    """Binned-engine tile-row scaling on the mesh scenes (VERDICT r5
    item 7): per-device program = render_linear_pallas_binned over the
    interleaved tile-row subset, exactly what _sharded_binned_fn runs per
    shard (uncapped, as the sharded path is).  Reports efficiency,
    segment load balance across interleaved tile rows, and the same
    additivity check as the sphere rows."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    import raytracer_tpu as rt
    from raytracer_tpu import ops as ops_mod
    from raytracer_tpu.ops.pallas import wavefront as wf
    from raytracer_tpu.ops.pallas import wavefront_binned as wbn
    from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order
    from raytracer_tpu.parallel.mesh import pad_to_multiple
    from raytracer_tpu.models.builders import icosphere_mesh
    from raytracer_tpu.scene import DIFFUSE, METAL, build_materials, \
        build_scene

    btris = (icosphere_mesh((-0.6, 0.0, -1.4), 0.45, 0, 6)
             + icosphere_mesh((0.6, 0.0, -1.2), 0.45, 2, 6))
    bmats = build_materials([(DIFFUSE, (0.7, 0.3, 0.3), 0.0, 1.0),
                             (DIFFUSE, (0.8, 0.8, 0.0), 0.0, 1.0),
                             (METAL, (0.85, 0.85, 0.9), 0.05, 1.0)])
    big = build_scene([((0.0, -100.5, -1.0), 100.0, 1)], btris, bmats,
                      exact_planes=True)
    bcam = rt.Camera.new_at((0.0, 0.0, 0.0), 1.77778)
    obj_scene, obj_cam = rt.models.obj_mesh_scene()

    results = []
    for cfg_name, scene, cam, depth in (
            ("obj10240", obj_scene, obj_cam, 4),
            ("mesh163840", big, bcam, 4)):
        (sph, sph_cl, *sorted_t) = ops_mod.scene_sorted_tables(scene)
        cv = wf.camera_vec(cam)
        order, keys = sorted_top_order(np.asarray(sorted_t[4]),
                                       np.asarray(cam.origin))
        n_tris = int(np.sum(np.asarray(scene.tri_valid)))
        br = 32 if n_tris < 4096 else 16
        w = h = 512
        spp = 4
        _, th, _, nty, _ = wbn.tile_geometry(w, h, spp, br)

        def render_band(ty0, stride, shard_nty, seed, depth=depth):
            return wbn.render_linear_pallas_binned(
                sph, *sorted_t, cv, width=w, height=h,
                samples_per_pixel=spp, depth=depth, seed=seed,
                sph_clusters=sph_cl, block_rows=br,
                ray_regroup_bounces=depth - 1,
                top_order=jnp.asarray(order), top_keys=jnp.asarray(keys),
                tile_row_offset=ty0, tile_row_stride=stride,
                shard_tile_rows=shard_nty)

        t_full, (_, segs_full) = _best(
            lambda s: render_band(0, 1, None, s))
        results.append({
            "metric": f"binned_{cfg_name}_1dev", "config": cfg_name,
            "devices": 1, "value": int(segs_full) / t_full,
            "unit": "rays/s", "efficiency": 1.0, "t_full_s": t_full,
        })
        for n in (2, 4, 8):
            nty_per = pad_to_multiple(nty, n) // n
            band_ts, band_segs = [], []
            for i in range(n):
                dt, (_, s) = _best(
                    lambda sd, i=i: render_band(i, n, nty_per, sd))
                band_ts.append(dt)
                band_segs.append(int(s))
            eff = t_full / (n * max(band_ts))
            results.append({
                "metric": f"binned_{cfg_name}_{n}dev_interleaved",
                "config": cfg_name, "devices": n,
                "value": sum(band_segs) / max(band_ts), "unit": "rays/s",
                "efficiency": eff, "assignment": "interleaved",
                "max_band_s": max(band_ts), "min_band_s": min(band_ts),
                "load_balance": (sum(band_segs) / n) / max(band_segs),
                "additivity_ratio": sum(band_ts) / t_full / 1.0,
            })
    return results


def cpu_mode():
    """8-virtual-device validation: bitwise gather + work balance."""
    import jax
    import numpy as np
    import raytracer_tpu as rt
    from raytracer_tpu import parallel, render as render_mod
    from raytracer_tpu.parallel.mesh import pad_to_multiple

    world = rt.models.default_world()
    scene, cam = world.to_scene(), world.to_camera()
    w, h, spp, d = 256, 256, 4, 8
    n = len(jax.devices())
    mesh = parallel.make_mesh(n)

    single, segs1 = render_mod.render_linear(
        scene, cam, width=w, height=h, samples_per_pixel=spp, depth=d,
        seed=0)
    sharded, segs_n = parallel.render_linear_sharded(
        scene, cam, mesh=mesh, width=w, height=h, samples_per_pixel=spp,
        depth=d, seed=0)
    bitwise = bool(np.array_equal(np.asarray(single), np.asarray(sharded)))

    # per-device work division (the load-balance term of efficiency),
    # contiguous row bands vs the shipped interleaved assignment
    import jax.numpy as jnp
    seed_word = jnp.uint32(0) * render_mod._SEED_MIX
    pix_all = jnp.arange(h * w, dtype=jnp.int32)

    def segs_for(pix):
        _, s = render_mod.accumulate_samples(
            scene, cam, pix // w, pix % w, w, h, spp, d, True, seed_word)
        return int(s)

    rows_per = pad_to_multiple(h, n) // n
    contiguous = [segs_for(pix_all[i * rows_per * w:(i + 1) * rows_per * w])
                  for i in range(n)]
    interleaved = [segs_for(pix_all[i::n]) for i in range(n)]

    def balance(segs):
        return (sum(segs) / len(segs)) / max(segs)

    return [{
        "metric": f"virtual_mesh_validation_{n}dev", "devices": n,
        "bitwise_equal_to_single_device": bitwise,
        "segments_single": int(segs1), "segments_sharded": int(segs_n),
        "load_balance_contiguous": balance(contiguous),
        "load_balance_interleaved": balance(interleaved),
        "band_segments_contiguous": contiguous,
        "band_segments_interleaved": interleaved,
    }]


def validate_mode():
    """Model-vs-measured anchor (VERDICT r3 item 7): the multi-chip model
    assumes band times are ADDITIVE (T_full ~= sum of per-band kernel
    times, no hidden superlinear cost), so measure exactly that on the one
    real chip: render the full frame, then render each of n interleaved
    bands, and report sum(band)/full.  A ratio near 1 anchors the
    extrapolation; the excess over 1 is the per-launch fixed cost the
    headline config's Amdahl analysis already charges."""
    import jax
    import raytracer_tpu as rt
    from raytracer_tpu import ops as ops_mod
    from raytracer_tpu.ops.pallas import wavefront as wf
    from raytracer_tpu.parallel.mesh import pad_to_multiple

    world = rt.models.default_world()
    scene, cam = world.to_scene(), world.to_camera()
    sph, tri, sph_cl, tri_cl = ops_mod.scene_tables(scene, True)
    cv = wf.camera_vec(cam)
    w, h, spp = 512, 512, 64

    def render_band(rows, row0, stride, seed):
        return wf.render_linear_pallas(
            sph, tri, cv, width=w, height=h, samples_per_pixel=spp,
            depth=D, seed=seed, parity_plane_sign=True,
            sph_clusters=sph_cl, tri_clusters=tri_cl,
            shard_rows=rows, row_offset=row0, row_stride=stride)

    t_full, _ = _best(lambda s: render_band(h, 0, 1, s))
    rows = []
    for n in (2, 4, 8):
        rows_per = pad_to_multiple(h, n) // n
        band_ts = []
        for i in range(n):
            dt, _ = _best(lambda sd, i=i: render_band(rows_per, i, n, sd))
            band_ts.append(dt)
        rows.append({
            "metric": f"band_additivity_{n}",
            "bands": n,
            "t_full_s": t_full,
            "sum_band_s": sum(band_ts),
            "additivity_ratio": sum(band_ts) / t_full,
        })
    return rows


def cpu_sanity_mode():
    """Virtual-8-device CPU wall-clock ratio — a SANITY row only: the
    container has ~2 host cores serving 8 virtual devices, so the ratio
    reflects oversubscription, not ICI scaling; it anchors that the
    sharded program actually executes and divides work on a multi-device
    mesh."""
    import jax
    import raytracer_tpu as rt
    from raytracer_tpu import parallel

    world = rt.models.default_world()
    scene, cam = world.to_scene(), world.to_camera()
    w, h, spp, d = 96, 64, 2, 4

    def single(seed):
        return rt.render_linear(scene, cam, width=w, height=h,
                                samples_per_pixel=spp, depth=d, seed=seed)

    mesh = parallel.make_mesh(8)

    def sharded(seed):
        return parallel.render_linear_sharded(
            scene, cam, mesh=mesh, width=w, height=h,
            samples_per_pixel=spp, depth=d, seed=seed)

    t1, _ = _best(single, n=2, pipeline=8)
    t8, _ = _best(sharded, n=2, pipeline=8)
    return {
        "metric": "cpu_vdev8_wallclock_sanity",
        "label": "sanity_only_oversubscribed_host",
        "t_single_s": t1,
        "t_sharded8_s": t8,
        "wallclock_ratio": t1 / t8,
        "note": ("8 virtual devices on ~2 host cores: validates the "
                 "sharded program runs and divides work, NOT an "
                 "efficiency measurement"),
    }


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "band"
    if mode == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
        out = cpu_mode()
    elif mode == "cpusanity":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
        row = cpu_sanity_mode()
        doc = json.loads((REPO / "SCALING.json").read_text())
        doc.setdefault("model_validation", {})["cpu_sanity"] = row
        (REPO / "SCALING.json").write_text(json.dumps(doc, indent=1) + "\n")
        print(f"appended cpu sanity to {REPO / 'SCALING.json'}",
              file=sys.stderr)
        out = [row]
    elif mode == "band":
        out = band_mode()
    elif mode == "binned":
        out = binned_band_mode()
        doc = json.loads((REPO / "SCALING.json").read_text())
        doc["binned_band_scaling"] = out
        doc["binned_note"] = (
            "binned engine (triangle scenes) sharded by interleaved TILE "
            "ROWS (th-pixel-tall rows of tiles; regroups stay device-"
            "local, the only collective is the segment psum).  Same "
            "model as band_scaling: efficiency(n) = T_full / "
            "(n * max_band_time) on one real chip; additivity_ratio = "
            "sum(band_i) / T_full validates bands account for the whole "
            "frame.  Bands run uncapped, matching the sharded path.")
        (REPO / "SCALING.json").write_text(json.dumps(doc, indent=1) + "\n")
        print(f"appended binned rows to {REPO / 'SCALING.json'}",
              file=sys.stderr)
    elif mode == "write":
        import jax
        if jax.default_backend() != "tpu":
            print("write mode needs the TPU chip", file=sys.stderr)
            return 1
        out = band_mode()
        doc = {"configs": [{"name": nm, "width": w, "height": h, "spp": s,
                            "depth": D} for nm, w, h, s in CONFIGS],
               "scene": "default_world (8 spheres)",
               "device": jax.devices()[0].device_kind,
               "band_scaling": out,
               "note": ("efficiency(n) = T_full / (n * max_band_time): the "
                        "sharded path's only collective is one scalar psum, "
                        "so per-band kernel time measured on one real chip "
                        "models the n-chip step.  Timing amortizes the "
                        "single-chip tunnel's ~20ms per-dispatch RPC over 8 "
                        "async dispatches (a pjit step is dispatched once "
                        "for all chips).  cpu-mode sharding validation "
                        "lives in tests/test_scaling.py")}
        doc["model_validation"] = {
            "band_additivity": validate_mode(),
            "note": ("additivity_ratio = sum of per-band kernel times / "
                     "full-frame time on ONE real chip: the multi-chip "
                     "rows above model an n-chip step as max(band_i); a "
                     "ratio near 1 validates that bands account for the "
                     "whole frame (no hidden superlinear cost).  Run "
                     "'cpusanity' mode to append the virtual-mesh "
                     "wall-clock sanity row."),
        }
        (REPO / "SCALING.json").write_text(json.dumps(doc, indent=1) + "\n")
        print(f"wrote {REPO / 'SCALING.json'}", file=sys.stderr)
    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        return 2
    for r in out:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
