"""Multi-device tests on the 8-device virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): the JAX-native fake backend for
distributed testing (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import raytracer_tpu as rt
from raytracer_tpu import grad as gradmod, parallel


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should expose 8 CPU devices"
    return parallel.make_mesh(8)


class TestShardedRender:
    def test_bitwise_equal_to_single_device(self, default_world, mesh8):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        img1, seg1 = rt.render_linear(scene, cam, width=48, height=24,
                                      samples_per_pixel=4, depth=4)
        img2, seg2 = parallel.render_linear_sharded(
            scene, cam, mesh=mesh8, width=48, height=24,
            samples_per_pixel=4, depth=4)
        assert np.array_equal(np.asarray(img1), np.asarray(img2))
        assert int(seg1) == int(seg2)

    def test_non_divisible_pixel_count_padded(self, default_world, mesh8):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        # 35 * 13 = 455 pixels, not a multiple of 8
        img1, _ = rt.render_linear(scene, cam, width=35, height=13,
                                   samples_per_pixel=2, depth=3)
        img2, _ = parallel.render_linear_sharded(
            scene, cam, mesh=mesh8, width=35, height=13,
            samples_per_pixel=2, depth=3)
        assert np.array_equal(np.asarray(img1), np.asarray(img2))

    def test_output_actually_sharded(self, default_world, mesh8):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        img, _ = parallel.render_linear_sharded(
            scene, cam, mesh=mesh8, width=32, height=16,
            samples_per_pixel=1, depth=2)
        # result must be addressable and correct on the host
        assert np.asarray(img).shape == (16, 32, 3)

    def test_subset_mesh(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        mesh2 = parallel.make_mesh(2)
        img1, _ = rt.render_linear(scene, cam, width=16, height=8,
                                   samples_per_pixel=2, depth=2)
        img2, _ = parallel.render_linear_sharded(
            scene, cam, mesh=mesh2, width=16, height=8,
            samples_per_pixel=2, depth=2)
        assert np.array_equal(np.asarray(img1), np.asarray(img2))

    def test_ray_trace_sharded_u8(self, default_world, mesh8):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        fb, segs = parallel.ray_trace_sharded(
            scene, cam, 32, 16,
            rt.Options(samples_per_pixel=2, max_ray_bounces=3), mesh=mesh8)
        fb1, _ = rt.ray_trace(scene, cam, 32, 16,
                              rt.Options(samples_per_pixel=2, max_ray_bounces=3))
        assert np.array_equal(fb, fb1)
        assert segs > 0


class TestShardedGradients:
    def test_sharded_grad_matches_single_device(self, mesh8):
        w = rt.models.sphere_and_ground()
        scene, cam = w.to_scene(), w.to_camera()
        W, H = 24, 16
        target, _ = rt.render_linear(scene, cam, width=W, height=H,
                                     samples_per_pixel=2, depth=2, seed=3)
        params = gradmod.extract_params(scene, ["sphere_center", "mat_color"])
        params["sphere_center"] = params["sphere_center"] + 0.02

        loss_single = gradmod.make_loss_fn(
            scene, cam, target, width=W, height=H, samples_per_pixel=2,
            depth=2, seed=3)
        loss_sharded = gradmod.make_loss_fn(
            scene, cam, target, width=W, height=H, samples_per_pixel=2,
            depth=2, seed=3, mesh=mesh8)

        g1 = jax.grad(loss_single)(params)
        g2 = jax.grad(loss_sharded)(params)
        for k in params:
            np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                       rtol=1e-5, atol=1e-8)

    def test_sharded_train_step_runs(self, mesh8):
        # the full sharded training step: forward + backward + psum + adam
        import optax
        w = rt.models.sphere_and_ground()
        scene, cam = w.to_scene(), w.to_camera()
        W, H = 16, 16
        target, _ = rt.render_linear(scene, cam, width=W, height=H,
                                     samples_per_pixel=1, depth=2, seed=0)
        params = gradmod.extract_params(scene, ["mat_color"])
        params["mat_color"] = params["mat_color"] * 0.7
        loss_fn = gradmod.make_loss_fn(scene, cam, target, width=W, height=H,
                                       samples_per_pixel=1, depth=2, seed=0,
                                       mesh=mesh8)
        opt = optax.adam(1e-2)
        step = gradmod.make_train_step(loss_fn, opt)
        state = opt.init(params)
        p, state, l0 = step(params, state)
        p, state, l1 = step(p, state)
        assert np.isfinite(float(l0)) and np.isfinite(float(l1))
        assert float(l1) <= float(l0)
