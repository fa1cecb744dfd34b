"""HBM-streamed megakernel tests (interpret mode on CPU).

The streamed kernel must agree with the SMEM-resident kernel bit-for-bit
(same physics helpers, same op order — wavefront_stream.py) and with the
XLA wavefront path to float tolerance, and its banding must compose with
the sharded path the same way the SMEM kernel's does."""

import numpy as np
import jax.numpy as jnp
import pytest

import raytracer_tpu as rt
from raytracer_tpu import ops as ops_mod
from raytracer_tpu.ops.pallas import wavefront as wf
from raytracer_tpu.ops.pallas import wavefront_stream as ws


@pytest.fixture(scope="module")
def mesh_world():
    scene, cam = rt.models.mesh_scene(subdivisions=2)
    return scene, cam


@pytest.fixture(scope="module")
def stream_tables(mesh_world):
    scene, _ = mesh_world
    return tuple(jnp.asarray(t) for t in ws.build_tri_stream_tables(scene))


class TestStreamKernel:
    W, H, SPP, D = 64, 48, 2, 4

    def _stream(self, scene, cam, tables, **kw):
        sph = jnp.asarray(wf.pack_spheres(scene))
        tri_hbm, leafb, leafn, topb, topr, root = tables
        return ws.render_linear_pallas_stream(
            sph, tri_hbm, leafb, leafn, topb, topr, root,
            wf.camera_vec(cam),
            width=kw.pop("width", self.W), height=kw.pop("height", self.H),
            samples_per_pixel=kw.pop("spp", self.SPP),
            depth=kw.pop("depth", self.D), interpret=True, **kw)

    def test_bitwise_equal_to_smem_kernel(self, mesh_world, stream_tables):
        scene, cam = mesh_world
        sph = jnp.asarray(wf.pack_spheres(scene))
        tri = jnp.asarray(wf.pack_triangles(scene))
        ref, seg_ref = wf.render_linear_pallas(
            sph, tri, wf.camera_vec(cam), width=self.W, height=self.H,
            samples_per_pixel=self.SPP, depth=self.D,
            parity_plane_sign=False, interpret=True)
        got, seg = self._stream(scene, cam, stream_tables)
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        assert int(seg_ref) == int(seg)

    def test_matches_xla_path(self, mesh_world, stream_tables):
        # Cross-ENGINE comparison on a dense mesh: different FMA rounding
        # flips which triangle wins for rays grazing shared edges, and a
        # flipped winner changes that sample's whole bounce path by O(1) —
        # so the assertion is bulk agreement (identical almost everywhere,
        # edge-decision flips bounded), not elementwise closeness.  The
        # elementwise-strong statement is test_bitwise_equal_to_smem_kernel.
        scene, cam = mesh_world
        ref, seg_ref = rt.render_linear(
            scene, cam, width=self.W, height=self.H,
            samples_per_pixel=self.SPP, depth=self.D,
            parity_plane_sign=False)
        got, seg = self._stream(scene, cam, stream_tables)
        d = np.abs(np.asarray(ref) - np.asarray(got))
        assert np.median(d) <= 1e-6          # bulk of the image identical
        assert (d > 1e-4).mean() < 0.08      # only edge-flip pixels differ
        assert abs(int(seg_ref) - int(seg)) <= 0.01 * int(seg_ref)

    def test_row_band_matches_full(self, mesh_world, stream_tables):
        scene, cam = mesh_world
        full, _ = self._stream(scene, cam, stream_tables)
        band, _ = self._stream(scene, cam, stream_tables,
                               shard_rows=8, row_offset=10)
        assert np.array_equal(np.asarray(full)[10:18], np.asarray(band))

    def test_row_stride_matches_full(self, mesh_world, stream_tables):
        scene, cam = mesh_world
        full, _ = self._stream(scene, cam, stream_tables)
        sub, _ = self._stream(scene, cam, stream_tables,
                              shard_rows=16, row_offset=1, row_stride=3)
        assert np.array_equal(np.asarray(full)[1:self.H:3],
                              np.asarray(sub)[: len(range(1, self.H, 3))])

    def test_sorted_walk_matches_table_order(self, mesh_world,
                                             stream_tables):
        # front-to-back order + primary early exit must not change the
        # image: the exit fires only when no remaining leaf can beat any
        # relevant lane's closest hit
        scene, cam = mesh_world
        full, seg_full = self._stream(scene, cam, stream_tables)
        order, keys = ws.sorted_top_order(stream_tables[3],
                                          np.asarray(cam.origin))
        srt, seg_srt = self._stream(scene, cam, stream_tables,
                                    top_order=jnp.asarray(order),
                                    top_keys=jnp.asarray(keys))
        assert np.array_equal(np.asarray(full), np.asarray(srt))
        assert int(seg_full) == int(seg_srt)

    def test_multi_leaf_scene(self):
        # force several leaves (LEAF=128 members/leaf)
        scene, cam = rt.models.mesh_scene(subdivisions=3)  # 1292 tris
        tables = tuple(jnp.asarray(t)
                       for t in ws.build_tri_stream_tables(scene))
        assert tables[1].shape[1] > 8      # leaves
        # multi-leaf traversal must agree with the SMEM kernel bitwise
        # (same math; only the streaming machinery differs)
        sph = jnp.asarray(wf.pack_spheres(scene))
        tri = jnp.asarray(wf.pack_triangles(scene))
        ref, segs_ref = wf.render_linear_pallas(
            sph, tri, wf.camera_vec(cam), width=32, height=24,
            samples_per_pixel=1, depth=3, parity_plane_sign=False,
            interpret=True)
        got, segs = self._stream(scene, cam, tables, width=32, height=24,
                                 spp=1, depth=3)
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        assert int(segs_ref) == int(segs)


class TestStreamTables:
    def test_leaf_alignment_and_counts(self, mesh_world):
        scene, _ = mesh_world
        (tri_hbm, leafb, leafn, topb, topr,
         root) = ws.build_tri_stream_tables(scene)
        L = leafb.shape[1]
        assert tri_hbm.shape == (ws.TRI_ROWS_PAD, L * ws.LEAF)
        assert ws.TRI_ROWS_PAD % 8 == 0  # HBM (8,128) tiling alignment
        n_valid = int(np.sum(np.asarray(scene.tri_valid)))
        assert int(leafn.sum()) == n_valid
        assert (leafn <= ws.LEAF).all()
        # padding columns never hit: zero normal row
        for k in range(L):
            n = int(leafn[0, k])
            pad = tri_hbm[0:3, k * ws.LEAF + n:(k + 1) * ws.LEAF]
            assert not pad.any()
    def test_bounds_nest(self, mesh_world):
        scene, _ = mesh_world
        (_, leafb, leafn, topb, topr,
         root) = ws.build_tri_stream_tables(scene)
        # every leaf inside its top node; every top inside the root
        for k in range(topb.shape[1]):
            if topb[3, k] < 0:
                continue
            for m in range(int(topr[0, k]), int(topr[1, k])):
                if leafb[3, m] < 0:
                    continue
                d = np.linalg.norm(leafb[0:3, m] - topb[0:3, k])
                assert d + np.sqrt(leafb[3, m]) <= np.sqrt(topb[3, k]) + 1e-3
            d = np.linalg.norm(topb[0:3, k] - root[0:3, 0])
            assert d + np.sqrt(topb[3, k]) <= np.sqrt(root[3, 0]) + 1e-3

    def test_sorted_order_keys_nondecreasing(self, mesh_world):
        scene, cam = mesh_world
        tables = ws.build_tri_stream_tables(scene)
        topb = tables[3]
        order, keys = ws.sorted_top_order(topb, np.asarray(cam.origin))
        assert sorted(order[0].tolist()) == list(range(topb.shape[1]))
        finite = keys[0][np.isfinite(keys[0])]
        assert (np.diff(finite) >= 0).all()


class TestStreamDispatch:
    def test_can_use_pallas_stream_gates(self, mesh_world, monkeypatch):
        scene, _ = mesh_world
        monkeypatch.setattr(ops_mod, "backend_is_tpu", lambda: True)
        assert ops_mod.can_use_pallas_stream(scene, False)
        assert not ops_mod.can_use_pallas_stream(scene, True)  # parity sign
        monkeypatch.setattr(ops_mod, "backend_is_tpu", lambda: False)
        assert not ops_mod.can_use_pallas_stream(scene, False)

    def test_stream_tables_cached(self, mesh_world):
        scene, _ = mesh_world
        t1 = ops_mod.scene_stream_tables(scene)
        n = ops_mod.pack_events
        t2 = ops_mod.scene_stream_tables(scene)
        assert ops_mod.pack_events == n
        assert t1[2] is t2[2]


class TestShardedStream:
    def test_sharded_stream_bitwise_equal(self, mesh_world, stream_tables):
        import jax
        from raytracer_tpu import parallel
        assert len(jax.devices()) >= 8
        mesh8 = parallel.make_mesh(8)
        scene, cam = mesh_world
        sph = jnp.asarray(wf.pack_spheres(scene))
        tri_hbm, leafb, leafn, topb, topr, root = stream_tables
        order, keys = ws.sorted_top_order(np.asarray(topb),
                                          np.asarray(cam.origin))
        ref, seg_ref = ws.render_linear_pallas_stream(
            sph, tri_hbm, leafb, leafn, topb, topr, root,
            wf.camera_vec(cam), width=64, height=48, samples_per_pixel=2,
            depth=3, interpret=True, top_order=jnp.asarray(order),
            top_keys=jnp.asarray(keys))
        got, seg = parallel.render_linear_sharded_fast(
            scene, cam, mesh=mesh8, width=64, height=48,
            samples_per_pixel=2, depth=3, engine="pallas_stream",
            interpret=True)
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        assert int(seg_ref) == int(seg)
