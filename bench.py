"""Benchmark: rays/sec/chip on the BASELINE north-star config.

Default: renders the reference's bundled 8-sphere world at 512x512 / 64 spp
/ 8 bounces and prints ONE JSON line:
  {"metric": ..., "value": rays/s, "unit": "rays/s", "vs_baseline": ...}

"Segments" = rays actually submitted to the intersector (live rays per
bounce summed over the scan), counted on-device by the renderer.

vs_baseline: the reference publishes no numbers (BASELINE.md — "None"), so
the yardstick is the BASELINE.json north-star target of 1e9 rays/s on a
v5p-16 (16 chips) == 6.25e7 rays/s/chip; vs_baseline = value / 6.25e7.

``--all`` additionally benchmarks the other BASELINE.json configs (random
spheres, triangle mesh, gradient pass), one JSON line each.
"""

import json
import sys
import time

WIDTH = 512
HEIGHT = 512
SPP = 64
DEPTH = 8
PER_CHIP_TARGET = 1e9 / 16.0  # north-star: >1e9 rays/s on v5p-16


def _time_best(fn, n=5, k=8):
    """Steady-state per-call device time: MEDIAN over n trials of
    (t(2k) - t(k)) / k with async dispatch batches (block once per batch).
    The difference cancels the constant per-batch overhead — on this
    single-chip-via-tunnel setup each blocking dispatch pays a ~20 ms RPC
    round trip that is not kernel time (a locally attached chip, or a pod
    pjit step dispatched once for all chips, does not pay it per frame).
    The median (not min) rejects trials where tunnel jitter swallows part
    of the marginal batch — observed to inflate a rate by 1.6x once."""
    import statistics
    import jax
    out = fn(0)
    jax.block_until_ready(out)
    # second warmup: engines that autotune on the first call (binned
    # bounce caps) compile their steady-state variant on the SECOND
    out = fn(0)
    jax.block_until_ready(out)

    def batch(count, seed0):
        t0 = time.perf_counter()
        outs = [fn(seed0 + i) for i in range(count)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0, outs[-1]

    times = []
    for t in range(n):
        tk, _ = batch(k, 1 + 100 * t)
        t2k, out = batch(2 * k, 50 + 100 * t)
        times.append(max(t2k - tk, 1e-9) / k)
    return statistics.median(times), out


def bench_headline():
    import raytracer_tpu as rt
    from raytracer_tpu import ops as ops_mod

    world = rt.models.default_world()
    scene = world.to_scene()
    camera = world.to_camera()

    def run(seed):
        img, segments = ops_mod.render_linear_fast(
            scene, camera, width=WIDTH, height=HEIGHT,
            samples_per_pixel=SPP, depth=DEPTH, seed=seed)
        return img, segments

    dt, (img, segments) = _time_best(run)
    segments = int(segments)
    rays_per_sec = segments / dt
    return {
        "metric": f"rays_per_sec_chip_{WIDTH}x{HEIGHT}_{SPP}spp",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / PER_CHIP_TARGET,
    }, dt, segments


def bench_all():
    import jax
    import raytracer_tpu as rt
    from raytracer_tpu import grad as gradmod, ops as ops_mod

    results = []

    # config 2: ~500-sphere random scene, 512x512x16spp
    scene, cam = rt.models.random_spheres()
    def run_rs(seed):
        return ops_mod.render_linear_fast(
            scene, cam, width=512, height=512, samples_per_pixel=16,
            depth=DEPTH, seed=seed)
    dt, (_, segs) = _time_best(run_rs)
    results.append({
        "metric": f"random_spheres_{scene.num_spheres}sph_512x512_16spp",
        "value": int(segs) / dt, "unit": "rays/s",
        "vs_baseline": int(segs) / dt / PER_CHIP_TARGET})

    # config 3: triangle-mesh scene (BVH-free brute force), 512x512
    mscene, mcam = rt.models.mesh_scene(subdivisions=3)
    def run_ms(seed):
        return ops_mod.render_linear_fast(
            mscene, mcam, width=512, height=512, samples_per_pixel=4,
            depth=4, seed=seed)
    dt, (_, segs) = _time_best(run_ms)
    results.append({
        "metric": f"mesh_{mscene.num_triangles}tri_512x512_4spp",
        "value": int(segs) / dt, "unit": "rays/s",
        "vs_baseline": int(segs) / dt / PER_CHIP_TARGET})

    # config 3 at its stated scale: ~10k-tri OBJ mesh (exact_planes scenes
    # resolve to the corrected plane equation and the sorted engine
    # automatically — ops.resolve_dispatch)
    oscene, ocam = rt.models.obj_mesh_scene()
    def run_obj(seed):
        return ops_mod.render_linear_fast(
            oscene, ocam, width=512, height=512, samples_per_pixel=4,
            depth=4, seed=seed)
    dt, (_, segs) = _time_best(run_obj)
    results.append({
        "metric": f"obj_mesh_{oscene.num_triangles}tri_512x512_4spp",
        "value": int(segs) / dt, "unit": "rays/s",
        "vs_baseline": int(segs) / dt / PER_CHIP_TARGET})

    # the VERDICT r2 criterion scene: 164k tris at depth 4
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
    results.append({
        "metric": f"mesh_{bscene.num_triangles}tri_512x512_4spp_depth4",
        "value": int(segs) / dt, "unit": "rays/s",
        "vs_baseline": int(segs) / dt / PER_CHIP_TARGET})

    # gradient pass (inverse-rendering step): forward+backward rays/s —
    # engine="auto" rides the fused kernel forward AND the hand-derived
    # backward kernel (ops/pallas/wavefront_bwd.py) on TPU
    world = rt.models.default_world()
    dscene, dcam = world.to_scene(), world.to_camera()
    W = H = 256
    gspp, gd = 8, 4
    target, _ = rt.render_linear(dscene, dcam, width=W, height=H,
                                 samples_per_pixel=gspp, depth=gd, seed=0)
    loss_fn = gradmod.make_loss_fn(dscene, dcam, target, width=W, height=H,
                                   samples_per_pixel=gspp, depth=gd, seed=1,
                                   engine="auto")
    params = gradmod.extract_params(
        dscene, ["sphere_center", "sphere_radius", "mat_color"])
    vg = jax.jit(jax.value_and_grad(loss_fn))
    def run_g(_):
        return vg(params)
    dt, _ = _time_best(run_g)
    paths = W * H * gspp
    results.append({
        "metric": f"grad_pass_paths_per_sec_{W}x{H}_{gspp}spp",
        "value": paths / dt, "unit": "paths/s",
        "vs_baseline": paths / dt / 1e6})  # vs 1 Mpaths/s nominal

    # gradient pass on the 10k-tri OBJ mesh (VERDICT r3 item 3): kernel
    # forward + hand-derived kernel backward with STATIC cluster topology
    # and traceably recomputed bounds (ops/diff.build_tri_cull).  The XLA
    # recompute backward cannot even compile at this size on TPU (its
    # scan residuals materialize an (spp, depth, T, npix) tensor — 86 GB
    # at 256^2); measured 208x slower at the largest size it does compile
    # (32x32, see PERFSTUDY "gradbig").
    oscene2, ocam2 = rt.models.obj_mesh_scene()
    gt, _ = ops_mod.render_linear_fast(
        oscene2, ocam2, width=W, height=H, samples_per_pixel=gspp,
        depth=gd, seed=0)
    oloss = gradmod.make_loss_fn(oscene2, ocam2, gt, width=W, height=H,
                                 samples_per_pixel=gspp, depth=gd, seed=1,
                                 parity_plane_sign=False, engine="pallas")
    oparams = gradmod.extract_params(oscene2, ["tri_v0", "mat_color"])
    ovg = jax.jit(jax.value_and_grad(oloss))
    def run_og(_):
        return ovg(oparams)
    dt, _ = _time_best(run_og)
    results.append({
        "metric": f"grad_pass_obj10240tri_paths_per_sec_{W}x{H}_{gspp}spp",
        "value": paths / dt, "unit": "paths/s",
        "vs_baseline": paths / dt / 1e6})

    # gradient pass on the 164k-tri mesh (VERDICT r5 item 3): the packed
    # tables are ~14x the SMEM budget, so the differentiable kernels
    # stream leaf-aligned triangle slots from HBM (ops.diff
    # tri_stream_table_jnp + wavefront._streamed_tri_walk).  XLA AD has
    # NO path at any size here (43 GB residuals at 256^2).
    bspp, bd = 4, 4
    bgt, _ = ops_mod.render_linear_fast(
        bscene, bcam, width=W, height=H, samples_per_pixel=bspp,
        depth=bd, seed=0)
    bloss = gradmod.make_loss_fn(bscene, bcam, bgt, width=W, height=H,
                                 samples_per_pixel=bspp, depth=bd, seed=1,
                                 parity_plane_sign=False, engine="pallas")
    bparams = gradmod.extract_params(bscene, ["tri_v0"])
    bvg = jax.jit(jax.value_and_grad(bloss))
    def run_bg(_):
        return bvg(bparams)
    dt, _ = _time_best(run_bg, n=2, k=2)
    bpaths = W * H * bspp
    results.append({
        "metric": f"grad_pass_mesh163840tri_paths_per_sec_{W}x{H}_{bspp}spp",
        "value": bpaths / dt, "unit": "paths/s",
        "vs_baseline": bpaths / dt / 1e6})

    # certify every capped binned frame rendered above was exact
    assert ops_mod.flush_binned_overflow_checks() == 0, \
        "binned bounce-cap overflow: rerun (caps auto-invalidate)"
    return results


def main() -> int:
    import jax

    headline, dt, segments = bench_headline()
    print(json.dumps(headline))
    print(
        f"[bench] device={jax.devices()[0].device_kind} "
        f"segments/run={segments} best={dt:.3f}s "
        f"paths/s={WIDTH*HEIGHT*SPP/dt:.3e}",
        file=sys.stderr)

    if "--all" in sys.argv[1:]:
        rows = [headline] + bench_all()
        for r in rows[1:]:
            print(json.dumps(r), file=sys.stderr)
        if "--write" in sys.argv[1:]:
            # the committed full bench matrix (VERDICT r2 item 7):
            # refreshed by `python bench.py --all --write`
            import pathlib
            doc = {"device": jax.devices()[0].device_kind,
                   "timing": "min (t(2k)-t(k))/k, async dispatch batches",
                   "rows": rows}
            path = pathlib.Path(__file__).parent / "BENCHMARKS.json"
            path.write_text(json.dumps(doc, indent=1) + "\n")
            print(f"[bench] wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
