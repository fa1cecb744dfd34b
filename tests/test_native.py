"""Native C++ runtime tests: the C ABI engine must BIT-MATCH the oracle in
parity mode (same algorithm, same stream, same f32 op order — compiled with
-ffp-contract=off)."""

import os
import shutil

import numpy as np
import pytest

import raytracer_tpu as rt

native = pytest.importorskip("raytracer_tpu.native")

try:
    native.load_library()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native library unavailable")


class TestNativeParity:
    def test_default_world_bit_exact(self, default_world):
        src = rt.models.default_world_source()
        w = native.NativeWorld(src)
        got = w.render(32, 18, samples_per_pixel=2, max_ray_bounces=4)
        ocam, oworld = default_world.to_oracle()
        ref = rt.oracle.ray_trace(oworld, ocam, 32, 18, 2, 4)
        assert np.array_equal(got, ref), (
            f"native/oracle mismatch: {np.abs(got.astype(int)-ref.astype(int)).max()}")

    def test_triangles_bit_exact(self, ffi_world):
        src = rt.models.ffi_example_source()
        w = native.NativeWorld(src)
        got = w.render(24, 24, samples_per_pixel=2, max_ray_bounces=4)
        ocam, oworld = ffi_world.to_oracle()
        ref = rt.oracle.ray_trace(oworld, ocam, 24, 24, 2, 4)
        assert np.array_equal(got, ref)

    def test_custom_seed(self, default_world):
        src = rt.models.default_world_source()
        w = native.NativeWorld(src)
        got = w.render(16, 9, samples_per_pixel=2, max_ray_bounces=3,
                       seed=4242)
        ocam, oworld = default_world.to_oracle()
        ref = rt.oracle.ray_trace(oworld, ocam, 16, 9, 2, 3, seed=4242)
        assert np.array_equal(got, ref)


class TestNativeFastMode:
    def test_fast_mode_renders_and_is_deterministic(self):
        src = rt.models.default_world_source()
        w = native.NativeWorld(src)
        a = w.render(48, 27, samples_per_pixel=8, max_ray_bounces=4,
                     parity=False, num_threads=4)
        b = w.render(48, 27, samples_per_pixel=8, max_ray_bounces=4,
                     parity=False, num_threads=2)
        # thread count must not change the image (per-pixel counters)
        assert np.array_equal(a, b)
        assert (a[..., 3] == 255).all()

    def test_fast_mode_close_to_parity(self):
        src = rt.models.default_world_source()
        w = native.NativeWorld(src)
        fast = w.render(32, 18, samples_per_pixel=64, max_ray_bounces=4,
                        parity=False).astype(np.float32)
        par = w.render(32, 18, samples_per_pixel=64, max_ray_bounces=4,
                       parity=True).astype(np.float32)
        err = np.abs(fast[..., :3] - par[..., :3])
        assert err.mean() < 10.0  # MC noise between independent samplings


class TestNativeAPI:
    def test_parse_error(self):
        with pytest.raises(ValueError):
            native.NativeWorld("camera origin 0.0 0.0 aspect 1.0;")

    def test_move_camera(self):
        src = rt.models.default_world_source()
        w = native.NativeWorld(src)
        p0 = w.camera_position()
        w.move_camera(1.0, 0.5, -0.25)
        p1 = w.camera_position()
        np.testing.assert_allclose(p1 - p0, [1.0, 0.5, -0.25], atol=1e-6)

    def test_ppm_writer_matches_python(self, tmp_path):
        from raytracer_tpu import image as image_mod
        rng = np.random.default_rng(1)
        fb = rng.integers(0, 256, size=(5, 7, 4), dtype=np.uint8)
        p_native = tmp_path / "n.ppm"
        p_python = tmp_path / "p.ppm"
        native.write_ppm_native(fb, str(p_native))
        image_mod.write_ppm(fb, str(p_python))
        assert p_native.read_text() == p_python.read_text()

    def test_nul_terminated_source(self):
        src = "camera origin 0.0 0.0 0.0 aspect 1.0;\x00 garbage"
        w = native.NativeWorld(src)
        assert w.camera_position().shape == (3,)
