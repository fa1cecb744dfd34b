"""Camera tests: the three constructors + cast_ray vs the oracle camera."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.camera import Camera
from raytracer_tpu.oracle import OCamera


def _check_against_oracle(cam: Camera, ocam: OCamera, pts):
    for s, t in pts:
        o, d = cam.cast_rays(jnp.float32(s), jnp.float32(t))
        oo, od = ocam.cast_ray(s, t)
        np.testing.assert_allclose(np.asarray(o), oo, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d), od, atol=1e-6)


PTS = [(0.0, 0.0), (1.0, 1.0), (0.5, 0.5), (0.25, 0.75)]


class TestConstructors:
    def test_new_at(self):
        cam = Camera.new_at((0.5, -0.25, 1.0), 1.77778)
        ocam = OCamera.new_at(np.array([0.5, -0.25, 1.0], np.float32), 1.77778)
        _check_against_oracle(cam, ocam, PTS)
        assert abs(float(cam.aspect_ratio()) - 1.77778) < 1e-5

    def test_new_with_vertical_fov(self):
        fov = np.pi / 2.0
        cam = Camera.new_with_vertical_fov((0.0, 0.0, 0.0), fov, 1.5)
        ocam = OCamera.new_with_vertical_fov(
            np.zeros(3, np.float32), fov, 1.5)
        _check_against_oracle(cam, ocam, PTS)

    def test_new_look_at(self):
        # the CLI camera (main.rs:86-88)
        fov = np.pi / 2.0
        cam = Camera.new_look_at((0, 0, 0), (0, 0, -1), (0, 1, 0), fov, 1.77778)
        ocam = OCamera.new_look_at(
            np.zeros(3, np.float32), np.array([0, 0, -1], np.float32),
            np.array([0, 1, 0], np.float32), fov, 1.77778)
        _check_against_oracle(cam, ocam, PTS)

    def test_new_look_at_offaxis_unnormalized_basis(self):
        # NVec3::cross is unnormalized (maths.rs:131-137) — verify we match
        # the oracle for a skewed view where u, v are NOT unit
        fov = 1.0
        cam = Camera.new_look_at((3, 2, 1), (0, 0, -1), (0, 1, 0), fov, 1.2)
        ocam = OCamera.new_look_at(
            np.array([3, 2, 1], np.float32), np.array([0, 0, -1], np.float32),
            np.array([0, 1, 0], np.float32), fov, 1.2)
        _check_against_oracle(cam, ocam, PTS)

    def test_look_at_asserts(self):
        import pytest
        with pytest.raises(ValueError):
            Camera.new_look_at((1, 1, 1), (1, 1, 1), (0, 1, 0), 1.0, 1.0)
        with pytest.raises(ValueError):
            # degenerate basis: looking straight along 'up' makes u = v = 0
            # and trips the |v.y| > 1e-8 assert (camera.rs:61)
            Camera.new_look_at((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0, 1, 0),
                               1.0, 1.0)


class TestRays:
    def test_vectorized_grid(self):
        cam = Camera.new_at((0, 0, 0), 1.0)
        s = jnp.linspace(0, 1, 8)
        t = jnp.linspace(0, 1, 8)
        ss, tt = jnp.meshgrid(s, t)
        o, d = cam.cast_rays(ss, tt)
        assert o.shape == (8, 8, 3) and d.shape == (8, 8, 3)
        lens = np.linalg.norm(np.asarray(d), axis=-1)
        np.testing.assert_allclose(lens, 1.0, atol=1e-6)

    def test_center_ray_points_forward(self):
        cam = Camera.new_at((0, 0, 0), 1.0)
        _, d = cam.cast_rays(0.5, 0.5)
        d = np.asarray(d)
        assert d[2] < -0.99  # towards -z

    def test_moved_by(self):
        # lib.rs:60-63: rebuild new_at at offset origin, same aspect
        cam = Camera.new_at((1.0, 2.0, 3.0), 1.5)
        moved = cam.moved_by((0.5, -1.0, 0.25))
        np.testing.assert_allclose(np.asarray(moved.position()),
                                   [1.5, 1.0, 3.25], atol=1e-6)
        assert abs(float(moved.aspect_ratio()) - 1.5) < 1e-6
