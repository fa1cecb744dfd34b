"""Golden-image tests.

Two tiers (SURVEY.md §4 implication):
  1. BIT-EXACT: the sequential parity renderer (exact xorshift32 stream in
     raster order) must reproduce the NumPy oracle — which re-derives the
     Rust reference algorithm line-by-line — to the last u8.
  2. STATISTICAL: the fast wavefront renderer uses independent RNG streams,
     so it must agree with the oracle within Monte-Carlo tolerance.
"""

import numpy as np
import pytest

import raytracer_tpu as rt


def _exact_case(world, W, H, spp, depth):
    scene = world.to_scene()
    cam = world.to_camera()
    ocam, oworld = world.to_oracle()
    ref = rt.oracle.ray_trace(oworld, ocam, W, H, spp, depth)
    got = rt.ray_trace_parity(scene, cam, W, H, spp, depth)
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.max() == 0, (
        f"parity mismatch: max {diff.max()} at "
        f"{np.unravel_index(diff.argmax(), diff.shape)}")


class TestBitExactParity:
    def test_default_world_small(self, default_world):
        _exact_case(default_world, 32, 18, 2, 4)

    def test_default_world_more_samples(self, default_world):
        _exact_case(default_world, 16, 9, 8, 8)

    def test_triangles(self, ffi_world):
        _exact_case(ffi_world, 24, 24, 2, 4)

    def test_sphere_and_ground(self):
        w = rt.models.sphere_and_ground()
        _exact_case(w, 24, 24, 4, 4)

    def test_custom_seed(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        ocam, oworld = default_world.to_oracle()
        ref = rt.oracle.ray_trace(oworld, ocam, 16, 9, 2, 3, seed=12345)
        got = rt.ray_trace_parity(scene, cam, 16, 9, 2, 3, seed=12345)
        assert np.array_equal(ref, got)


class TestFastRendererStatistical:
    def test_default_world_converges_to_oracle(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        ocam, oworld = default_world.to_oracle()
        W, H = 48, 27
        ref = rt.oracle.ray_trace(oworld, ocam, W, H, 32, 6).astype(np.float32)
        img, segs = rt.ray_trace(
            scene, cam, W, H,
            rt.Options(samples_per_pixel=256, max_ray_bounces=6))
        err = np.abs(ref[..., :3] - img.astype(np.float32)[..., :3])
        # residual is dominated by the 32-spp oracle noise
        assert err.mean() < 6.0, f"mean |err| {err.mean()}"
        assert np.percentile(err, 99) < 50.0
        assert segs > W * H * 256  # at least one bounce per primary ray

    def test_deterministic_given_seed(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        a, _ = rt.ray_trace(scene, cam, 16, 9,
                            rt.Options(samples_per_pixel=8, max_ray_bounces=4))
        b, _ = rt.ray_trace(scene, cam, 16, 9,
                            rt.Options(samples_per_pixel=8, max_ray_bounces=4))
        assert np.array_equal(a, b)

    def test_seed_changes_noise(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        a, _ = rt.ray_trace(scene, cam, 16, 9,
                            rt.Options(samples_per_pixel=2, max_ray_bounces=4,
                                       seed=1))
        b, _ = rt.ray_trace(scene, cam, 16, 9,
                            rt.Options(samples_per_pixel=2, max_ray_bounces=4,
                                       seed=2))
        assert not np.array_equal(a, b)

    def test_alpha_and_flip(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        img, _ = rt.ray_trace(scene, cam, 16, 9,
                              rt.Options(samples_per_pixel=2, max_ray_bounces=2))
        assert img.shape == (9, 16, 4)
        assert (img[..., 3] == 255).all()
        # sky is at the TOP after the flip: top rows brighter blue than ground rows
        assert img[0, :, 2].mean() > img[-1, :, 2].mean()

    def test_emission_terminal(self):
        # a pure emissive sphere on black: pixel = emission color where hit
        src = ("camera origin 0.0 0.0 0.0 aspect 1.0;\n"
               "material L : Emission color 1.0 0.25 0.0;\n"
               "sphere center 0.0 0.0 -1.0 radius 0.4 material L;")
        w = rt.parse_input(src)
        scene, cam = w.to_scene(), w.to_camera()
        img, _ = rt.ray_trace(scene, cam, 9, 9,
                              rt.Options(samples_per_pixel=16,
                                         max_ray_bounces=4))
        center = img[4, 4].astype(np.float32)
        # sqrt gamma of (1, .25, 0) -> (255, 127, 0)
        assert abs(center[0] - 255) <= 1
        assert abs(center[1] - 128) <= 2
        assert center[2] <= 1

    def test_depth_zero_black(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        # samples that never terminate return black; with depth=0 ALL rays
        # are bounce-exhausted immediately (common.rs:267/284)
        img, _ = rt.ray_trace(scene, cam, 8, 8,
                              rt.Options(samples_per_pixel=2,
                                         max_ray_bounces=0))
        assert (img[..., :3] == 0).all()
        assert (img[..., 3] == 255).all()
