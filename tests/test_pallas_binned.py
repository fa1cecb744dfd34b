"""Binned per-bounce renderer tests (interpret mode on CPU).

The binned pipeline reorders rays BETWEEN bounces (per-ray argsort or
chunked takes by the in-kernel next-top selection keys), but every
per-lane quantity — RNG streams (pcg3d counters on (pixel, sample,
bounce)), intersection arithmetic, shading — depends only on the ray's
identity, never its block, so the image must be INVARIANT to regroup
granularity and block size, and agree with the XLA wavefront path in
bulk (same envelope as the other Pallas engines: cross-engine FMA
rounding flips grazing-edge winners)."""

import numpy as np
import jax.numpy as jnp
import pytest

import raytracer_tpu as rt
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_binned as wbn
from raytracer_tpu.ops.pallas import wavefront_sorted as wso
from raytracer_tpu.ops.pallas.wavefront_stream import sorted_top_order


@pytest.fixture(scope="module")
def mesh_world():
    scene, cam = rt.models.mesh_scene(subdivisions=2)
    return scene, cam


@pytest.fixture(scope="module")
def binned_tables(mesh_world):
    scene, _ = mesh_world
    return [jnp.asarray(t) for t in wso.build_tri_sorted_tables(scene)]


class TestAabbTables:
    def test_aabbs_contain_members(self, mesh_world, binned_tables):
        scene, _ = mesh_world
        (tri_hbm, subb, subn, grpb, topb, topr, root, refp, norder,
         nkeys, nrunb, klo, khi, suba, grpa, topa) = binned_tables
        v0 = np.asarray(scene.tri_v0)
        v1 = np.asarray(scene.tri_v1)
        v2 = np.asarray(scene.tri_v2)
        valid = np.asarray(scene.tri_valid)
        verts = np.concatenate([v0[valid], v1[valid], v2[valid]])
        suba = np.asarray(suba)
        grpa = np.asarray(grpa)
        topa = np.asarray(topa)
        # every AABB level is nested: sub within its group, group within
        # its top, and the union of tops contains every vertex
        L = suba.shape[1]
        for li in range(L):
            if np.asarray(subn)[0, li] == 0:
                assert (suba[0:3, li] > suba[3:6, li]).all()
                continue
            g = li // wso.GROUP_SUBS
            assert (suba[0:3, li] >= grpa[0:3, g] - 1e-5).all()
            assert (suba[3:6, li] <= grpa[3:6, g] + 1e-5).all()
        lo = topa[0:3][:, topa[0] <= topa[3]].min(axis=1)
        hi = topa[3:6][:, topa[0] <= topa[3]].max(axis=1)
        assert (verts.min(axis=0) >= lo - 1e-4).all()
        assert (verts.max(axis=0) <= hi + 1e-4).all()


class TestBinnedRenderer:
    W, H, SPP, D = 64, 48, 2, 4

    def _binned(self, scene, cam, tables, **kw):
        sph = jnp.asarray(wf.pack_spheres(scene))
        order, keys = sorted_top_order(np.asarray(tables[4]),
                                       np.asarray(cam.origin))
        depth = kw.pop("depth", self.D)
        kw.setdefault("ray_regroup_bounces", depth - 1)
        return wbn.render_linear_pallas_binned(
            sph, *tables, wf.camera_vec(cam),
            width=kw.pop("width", self.W), height=kw.pop("height", self.H),
            samples_per_pixel=kw.pop("spp", self.SPP),
            depth=depth, interpret=True,
            top_order=jnp.asarray(order), top_keys=jnp.asarray(keys), **kw)

    def test_matches_xla_path_bulk(self, mesh_world, binned_tables):
        scene, cam = mesh_world
        ref, seg_ref = rt.render_linear(
            scene, cam, width=self.W, height=self.H,
            samples_per_pixel=self.SPP, depth=self.D,
            parity_plane_sign=False)
        got, seg = self._binned(scene, cam, binned_tables)
        d = np.abs(np.asarray(ref) - np.asarray(got))
        assert np.median(d) <= 1e-6
        assert (d > 1e-4).mean() < 0.08
        assert abs(int(seg_ref) - int(seg)) <= 0.01 * int(seg_ref)

    def test_regroup_granularity_invariant(self, mesh_world,
                                           binned_tables):
        # ray->block assignment must never change the image: per-lane
        # arithmetic and RNG depend only on the slot id
        scene, cam = mesh_world
        a, sa = self._binned(scene, cam, binned_tables,
                             ray_regroup_bounces=self.D - 1)
        b, sb = self._binned(scene, cam, binned_tables,
                             ray_regroup_bounces=0,
                             regroup_granularity=16)
        c, sc = self._binned(scene, cam, binned_tables,
                             ray_regroup_bounces=0,
                             regroup_granularity=128)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(np.asarray(a), np.asarray(c))
        assert float(sa) == float(sb) == float(sc)

    def test_block_rows_invariant(self, mesh_world, binned_tables):
        scene, cam = mesh_world
        a, sa = self._binned(scene, cam, binned_tables, block_rows=8)
        b, sb = self._binned(scene, cam, binned_tables, block_rows=16)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert float(sa) == float(sb)

    def test_super_selection_bitwise_invariant(self, mesh_world,
                                               binned_tables):
        # the two-level supertop next-top scan must produce the same keys
        # as the flat per-top scan: grouping is a pure optimization, so
        # the assembled image (and the per-bounce alive counts, which
        # depend on grouping only through nothing) are bitwise equal
        scene, cam = mesh_world
        a = self._binned(scene, cam, binned_tables, super_selection=False)
        b = self._binned(scene, cam, binned_tables, super_selection=True)
        assert (np.asarray(a[0]) == np.asarray(b[0])).all()
        assert int(a[1]) == int(b[1])

    def test_node_exit_is_pure_optimization(self, mesh_world,
                                            binned_tables):
        scene, cam = mesh_world
        a, sa = self._binned(scene, cam, binned_tables, node_exit=True)
        b, sb = self._binned(scene, cam, binned_tables, node_exit=False)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert float(sa) == float(sb)

    def test_depth_one_and_odd_sizes(self, mesh_world, binned_tables):
        scene, cam = mesh_world
        got, _ = self._binned(scene, cam, binned_tables, width=37,
                              height=21, spp=1, depth=1)
        ref, _ = rt.render_linear(scene, cam, width=37, height=21,
                                  samples_per_pixel=1, depth=1,
                                  parity_plane_sign=False)
        d = np.abs(np.asarray(ref) - np.asarray(got))
        assert np.median(d) <= 1e-6
        assert (d > 1e-4).mean() < 0.08

    def test_sphere_only_scene(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        tables = [jnp.asarray(t)
                  for t in wso.build_tri_sorted_tables(scene)]
        got, seg = self._binned(scene, cam, tables, width=24, height=16,
                                spp=2, depth=3)
        ref, seg_ref = rt.render_linear(scene, cam, width=24, height=16,
                                        samples_per_pixel=2, depth=3,
                                        parity_plane_sign=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        assert int(seg) == int(seg_ref)

    def test_spp_gate(self, mesh_world):
        with pytest.raises(ValueError):
            wbn.tile_geometry(64, 48, 3, 16)
        with pytest.raises(ValueError):
            wbn.tile_geometry(64, 48, 256, 16)
        # > 2^24 rays would overflow the f32 slot-id plane (ADVICE r4)
        with pytest.raises(ValueError):
            wbn.tile_geometry(1024, 1024, 32, 16)

    def test_sample_offset_parts_sum_to_full_render(self, mesh_world,
                                                    binned_tables):
        # non-power-of-two spp renders as power-of-two sub-renders on the
        # GLOBAL sample index (ops._binned_spp_parts): parts (2, 1) at
        # offsets (0, 2) must reproduce the spp=3 sample set exactly,
        # which equals the sorted engine's spp=3 image
        scene, cam = mesh_world
        p0, _ = self._binned(scene, cam, binned_tables, spp=2, depth=3,
                             sample_offset=0)
        p1, _ = self._binned(scene, cam, binned_tables, spp=1, depth=3,
                             sample_offset=2)
        got = (np.asarray(p0) * 2.0 + np.asarray(p1)) / 3.0
        sph = jnp.asarray(wf.pack_spheres(scene))
        order, keys = sorted_top_order(np.asarray(binned_tables[4]),
                                       np.asarray(cam.origin))
        ref, _ = wso.render_linear_pallas_sorted(
            sph, *binned_tables, wf.camera_vec(cam), width=self.W,
            height=self.H, samples_per_pixel=3, depth=3,
            top_order=jnp.asarray(order), top_keys=jnp.asarray(keys),
            interpret=True)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5,
                                   atol=2e-6)

    def test_bitwise_equal_to_sorted_engine(self, mesh_world,
                                            binned_tables):
        # same physics helpers, same RNG counters: ray order cannot
        # matter, so the two regrouping engines agree bit-for-bit
        scene, cam = mesh_world
        sph = jnp.asarray(wf.pack_spheres(scene))
        order, keys = sorted_top_order(np.asarray(binned_tables[4]),
                                       np.asarray(cam.origin))
        ref, seg_ref = wso.render_linear_pallas_sorted(
            sph, *binned_tables, wf.camera_vec(cam), width=self.W,
            height=self.H, samples_per_pixel=self.SPP, depth=self.D,
            interpret=True, top_order=jnp.asarray(order),
            top_keys=jnp.asarray(keys))
        got, seg = self._binned(scene, cam, binned_tables)
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        assert int(seg_ref) == int(seg)


class TestBounceCaps:
    """Working-set compaction (bounce_caps): dead rays sort last, so
    capping later bounces to the live prefix must be EXACT whenever the
    overflow guard reads zero — and the guard must fire when a live ray
    would be dropped."""

    def test_generous_caps_bitwise_exact(self, mesh_world, binned_tables):
        scene, cam = mesh_world
        sph = jnp.asarray(wf.pack_spheres(scene))
        order, keys = sorted_top_order(np.asarray(binned_tables[4]),
                                       np.asarray(cam.origin))
        kw = dict(width=64, height=48, samples_per_pixel=2, depth=3,
                  interpret=True, ray_regroup_bounces=2,
                  top_order=jnp.asarray(order),
                  top_keys=jnp.asarray(keys))
        ref, seg_ref = wbn.render_linear_pallas_binned(
            sph, *binned_tables, wf.camera_vec(cam), **kw)
        got, seg, overflow = wbn.render_linear_pallas_binned(
            sph, *binned_tables, wf.camera_vec(cam),
            bounce_caps=(10_000, 10_000), **kw)
        assert float(overflow) == 0.0
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        assert float(seg_ref) == float(seg)

    def test_tiny_caps_raise_overflow_guard(self, mesh_world,
                                            binned_tables):
        scene, cam = mesh_world
        sph = jnp.asarray(wf.pack_spheres(scene))
        order, keys = sorted_top_order(np.asarray(binned_tables[4]),
                                       np.asarray(cam.origin))
        _, _, overflow = wbn.render_linear_pallas_binned(
            sph, *binned_tables, wf.camera_vec(cam), width=64, height=48,
            samples_per_pixel=2, depth=3, interpret=True,
            ray_regroup_bounces=2, bounce_caps=(16, 16),
            top_order=jnp.asarray(order), top_keys=jnp.asarray(keys))
        assert float(overflow) > 0.0
