"""Intersection tests: batch closest-hit vs the scalar oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import raytracer_tpu as rt
from raytracer_tpu import intersect, oracle


def _grid_rays(cam, W, H):
    rows = np.repeat(np.arange(H), W)
    cols = np.tile(np.arange(W), H)
    u = (cols.astype(np.float32) + np.float32(0.5)) / np.float32(W - 1)
    v = (rows.astype(np.float32) + np.float32(0.5)) / np.float32(H - 1)
    return cam.cast_rays(jnp.asarray(u), jnp.asarray(v))


def _compare_with_oracle(world, W=32, H=18, parity=True):
    scene = world.to_scene()
    cam = world.to_camera()
    _, oworld = world.to_oracle()
    o, d = _grid_rays(cam, W, H)
    pack = intersect.pack_scene(scene)
    hb = intersect.closest_hit_batch(o, d, scene, pack,
                                     parity_plane_sign=parity)
    hbh, hbt = np.asarray(hb.hit), np.asarray(hb.t)
    hbm, hbn = np.asarray(hb.mat), np.asarray(hb.normal)
    on, dn = np.asarray(o), np.asarray(d)
    mats = world.materials
    for i in range(W * H):
        h = oracle._world_hit(oworld, on[i], dn[i], parity)
        if h is None:
            assert not hbh[i], f"ray {i}: batch hit, oracle missed"
        else:
            assert hbh[i], f"ray {i}: batch missed, oracle hit t={h[0]}"
            assert abs(h[0] - hbt[i]) < 1e-4 * max(1.0, abs(h[0])), \
                f"ray {i}: t {h[0]} vs {hbt[i]}"
            np.testing.assert_allclose(hbn[i], h[2], atol=1e-4)
            assert mats[hbm[i]].kind == h[3].kind


class TestClosestHit:
    def test_default_world_matches_oracle(self, default_world):
        _compare_with_oracle(default_world)

    def test_triangles_match_oracle(self, ffi_world):
        _compare_with_oracle(ffi_world, W=24, H=24)

    def test_fixed_plane_sign_mode(self, ffi_world):
        _compare_with_oracle(ffi_world, W=16, H=16, parity=False)

    def test_sphere_basic(self):
        # axis ray into unit sphere at z=-2: hits at t=1 (front face)
        scene = rt.build_scene([((0.0, 0.0, -2.0), 1.0, 0)], [],
                               rt.build_materials([(rt.DIFFUSE, (1, 1, 1), 0, 1)]))
        pack = intersect.pack_scene(scene)
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        h = intersect.closest_hit_batch(o, d, scene, pack)
        assert bool(h.hit[0])
        assert abs(float(h.t[0]) - 1.0) < 1e-6
        np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1],
                                   atol=1e-6)

    def test_sphere_inside_second_root(self):
        # origin inside the sphere: root1 < t_min, picks root2
        scene = rt.build_scene([((0.0, 0.0, 0.0), 1.0, 0)], [],
                               rt.build_materials([(rt.DIFFUSE, (1, 1, 1), 0, 1)]))
        pack = intersect.pack_scene(scene)
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        h = intersect.closest_hit_batch(o, d, scene, pack)
        assert bool(h.hit[0]) and abs(float(h.t[0]) - 1.0) < 1e-6

    def test_t_min_shadow_epsilon(self):
        # a hit at t < 0.001 is rejected (common.rs:242)
        scene = rt.build_scene([((0.0, 0.0, -1.0005), 1.0, 0)], [],
                               rt.build_materials([(rt.DIFFUSE, (1, 1, 1), 0, 1)]))
        pack = intersect.pack_scene(scene)
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        h = intersect.closest_hit_batch(o, d, scene, pack)
        # front surface at t=0.0005 < t_min -> rejected; back surface wins
        assert bool(h.hit[0])
        assert float(h.t[0]) > 1.0

    def test_triangle_miss_beside(self):
        tri = [((0.0, 0.0, -1.0), (1.0, 0.0, -1.0), (0.0, 1.0, -1.0), 0)]
        scene = rt.build_scene([], tri,
                               rt.build_materials([(rt.DIFFUSE, (1, 1, 1), 0, 1)]))
        pack = intersect.pack_scene(scene)
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.1, 0.1, -1.0], [-0.5, -0.5, -1.0]])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        h = intersect.closest_hit_batch(o, d, scene, pack)
        assert bool(h.hit[0])       # inside the triangle
        assert not bool(h.hit[1])   # beside

    def test_triangle_parallel(self):
        tri = [((0.0, 0.0, -1.0), (1.0, 0.0, -1.0), (0.0, 1.0, -1.0), 0)]
        scene = rt.build_scene([], tri,
                               rt.build_materials([(rt.DIFFUSE, (1, 1, 1), 0, 1)]))
        pack = intersect.pack_scene(scene)
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])  # parallel to the z=-1 plane
        h = intersect.closest_hit_batch(o, d, scene, pack)
        assert not bool(h.hit[0])

    def test_invalid_primitives_never_hit(self):
        scene = rt.build_scene([((0.0, 0.0, -2.0), 1.0, 0)], [],
                               rt.build_materials([(rt.DIFFUSE, (1, 1, 1), 0, 1)]),
                               pad_spheres_to=4, pad_triangles_to=4)
        pack = intersect.pack_scene(scene)
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]])   # away from the real sphere
        h = intersect.closest_hit_batch(o, d, scene, pack)
        assert not bool(h.hit[0])

    def test_exact_matches_batch_geometry(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        o, d = _grid_rays(cam, 8, 8)
        pack = intersect.pack_scene(scene)
        hb = intersect.closest_hit_batch(o, d, scene, pack)
        for i in range(0, 64, 7):
            he = intersect.closest_hit_exact(o[i], d[i], scene)
            assert bool(he.hit) == bool(hb.hit[i])
            if bool(he.hit):
                assert abs(float(he.t) - float(hb.t[i])) < 1e-4
