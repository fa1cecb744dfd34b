"""Embedding API (lib.rs parity), CLI (main.rs parity), and viewer tests."""

import os
import sys

import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu import api, cli, viewer
from raytracer_tpu.models import default_world_source, ffi_example_source


class TestEmbeddingAPI:
    def test_load_world(self):
        h = api.load_world(default_world_source())
        assert h.scene.num_spheres == 8
        # FFI path uses the DSL's camera (lib.rs:40-44)
        np.testing.assert_allclose(np.asarray(h.camera.position()), [0, 0, 0])

    def test_load_world_nul_terminated_bytes(self):
        # lib.rs:38-40 CStr semantics
        src = (default_world_source() + "\x00 trailing garbage").encode()
        h = api.load_world(src)
        assert h.scene.num_spheres == 8

    def test_render_defaults(self):
        # lib.rs:51 hardcodes 16 spp / 8 bounces
        assert api.FFI_DEFAULT_OPTIONS.samples_per_pixel == 16
        assert api.FFI_DEFAULT_OPTIONS.max_ray_bounces == 8
        h = api.load_world(default_world_source())
        fb = api.render(h, 32, 18,
                        rt.Options(samples_per_pixel=2, max_ray_bounces=2))
        assert fb.shape == (18, 32, 4) and fb.dtype == np.uint8

    def test_move_camera_position(self):
        h = api.load_world(default_world_source())
        h2 = api.move_camera_position(h, 1.0, 2.0, 3.0)
        np.testing.assert_allclose(np.asarray(h2.camera.position()),
                                   [1, 2, 3], atol=1e-6)
        # original handle unchanged (functional update)
        np.testing.assert_allclose(np.asarray(h.camera.position()),
                                   [0, 0, 0])

    def test_render_session_dirty_flag(self):
        s = api.RenderSession(default_world_source(), 16, 9,
                              rt.Options(samples_per_pixel=1,
                                         max_ray_bounces=2))
        f1 = s.frame()
        f2 = s.frame()
        assert f1 is f2          # cached while clean
        s.move_camera(0.0, 0.5, 0.0)
        f3 = s.frame()
        assert f3 is not f1
        assert not np.array_equal(f1, f3)

    def test_session_save(self, tmp_path):
        s = api.RenderSession(default_world_source(), 8, 4,
                              rt.Options(samples_per_pixel=1,
                                         max_ray_bounces=1))
        p = tmp_path / "f.ppm"
        s.save(str(p))
        assert p.read_text().startswith("P3\n8 4\n255\n")


class TestCLI:
    def test_get_arguments_defaults(self):
        # main.rs:24-25 defaults
        spp, depth, extras = cli.get_arguments([])
        assert spp == 50 and depth == 8 and extras == {}

    def test_get_arguments_parsing(self):
        spp, depth, extras = cli.get_arguments(
            ["samples=7", "ray_depth=3", "width=64", "out=x.ppm"])
        assert spp == 7 and depth == 3
        assert extras["width"] == 64 and extras["out"] == "x.ppm"

    def test_unknown_argument_panics(self):
        # main.rs:40
        with pytest.raises(SystemExit):
            cli.get_arguments(["bogus=1"])

    def test_main_renders_file(self, tmp_path, monkeypatch):
        scene = tmp_path / "w.txt"
        scene.write_text(default_world_source())
        out = tmp_path / "img.ppm"
        rc = cli.main([f"scene={scene}", "samples=1", "ray_depth=2",
                       "width=32", f"out={out}"])
        assert rc == 0
        text = out.read_text()
        # width 32 -> height = trunc(32/1.77778) = 17, the reference's
        # `as usize` truncation (main.rs:91-92; 400-wide gives 224)
        assert text.startswith("P3\n32 17\n255\n")

    def test_main_parity_mode(self, tmp_path):
        scene = tmp_path / "w.txt"
        scene.write_text(
            "camera origin 0.0 0.0 0.0 aspect 1.0;\n"
            "material G : Diffuse color 0.8 0.8 0.0;\n"
            "sphere center 0.0 -100.5 -1.0 radius 100.0 material G;\n")
        out = tmp_path / "p.ppm"
        rc = cli.main([f"scene={scene}", "samples=1", "ray_depth=2",
                       "width=16", "parity=1", "use_scene_camera=1",
                       f"out={out}"])
        assert rc == 0

    def test_main_ignores_scene_camera_by_default(self, tmp_path):
        # main.rs:57 discards the parsed camera; camera origin in the DSL
        # must not change the image
        a = tmp_path / "a.txt"
        b = tmp_path / "b.txt"
        base = ("material G : Diffuse color 0.5 0.5 0.5;\n"
                "sphere center 0.0 0.0 -1.0 radius 0.5 material G;\n")
        a.write_text("camera origin 0.0 0.0 0.0 aspect 1.77778;\n" + base)
        b.write_text("camera origin 5.0 5.0 5.0 aspect 1.77778;\n" + base)
        oa, ob = tmp_path / "a.ppm", tmp_path / "b.ppm"
        cli.main([f"scene={a}", "samples=1", "ray_depth=1", "width=16",
                  f"out={oa}"])
        cli.main([f"scene={b}", "samples=1", "ray_depth=1", "width=16",
                  f"out={ob}"])
        assert oa.read_text() == ob.read_text()


class TestViewer:
    def test_ansi_blit(self):
        fb = np.zeros((4, 3, 4), np.uint8)
        fb[0, :, 0] = 255  # red top row
        s = viewer.framebuffer_to_ansi(fb)
        lines = s.split("\n")
        assert len(lines) == 2            # 4 pixel rows -> 2 cell rows
        assert "38;2;255;0;0" in lines[0]
        assert "▀" in s

    def test_noninteractive_dump(self, capsys, monkeypatch):
        monkeypatch.setattr(sys.stdin, "isatty", lambda: False)
        viewer.run_viewer(width=16, samples=1, depth=1)
        out = capsys.readouterr().out
        assert "▀" in out


class TestProgressLogger:
    """Options.logger — the reference's scanline progress hook
    (common.rs:292,328-330), wired through banded rendering."""

    def test_banded_render_bitwise_equal_and_monotonic(self, default_world):
        scene = default_world.to_scene()
        cam = default_world.to_camera()
        calls = []
        opts = rt.Options(samples_per_pixel=2, max_ray_bounces=3)
        ref, seg_ref = rt.ray_trace(scene, cam, 24, 19, opts)
        opts_logged = rt.Options(samples_per_pixel=2, max_ray_bounces=3,
                                 logger=lambda done, h: calls.append((done, h)))
        got, seg = rt.ray_trace(scene, cam, 24, 19, opts_logged)
        assert np.array_equal(ref, got)
        assert int(seg) == int(seg_ref)
        assert calls and calls[-1] == (19, 19)
        dones = [d for d, _ in calls]
        assert dones == sorted(dones) and len(set(dones)) == len(dones)

    def test_scanline_logger_writes(self):
        import io
        from raytracer_tpu.utils.profiling import ScanlineLogger
        buf = io.StringIO()
        # reference format: countdown, left-padded to 4 (common.rs:329)
        ScanlineLogger(buf)(7, 40)
        assert buf.getvalue() == "\rScanline: 33  "


class TestCliObj:
    def test_obj_argument_renders(self, tmp_path):
        # cube OBJ -> auto-framed render through the full CLI path
        obj = tmp_path / "cube.obj"
        obj.write_text(
            "v -1 -1 -1\nv 1 -1 -1\nv 1 1 -1\nv -1 1 -1\n"
            "v -1 -1 1\nv 1 -1 1\nv 1 1 1\nv -1 1 1\n"
            "f 1 2 3 4\nf 5 8 7 6\nf 1 5 6 2\n"
            "f 2 6 7 3\nf 3 7 8 4\nf 5 1 4 8\n")
        out = tmp_path / "cube.png"
        rc = cli.main([f"obj={obj}", "samples=1", "ray_depth=2",
                       "width=24", f"out={out}"])
        assert rc == 0 and out.exists()
        assert out.read_bytes()[:4] == b"\x89PNG\r"[:4]
        # and through the PPM path with non-black content
        out2 = tmp_path / "cube.ppm"
        cli.main([f"obj={obj}", "samples=1", "ray_depth=2", "width=24",
                  f"out={out2}"])
        body = out2.read_text().split("255\n", 1)[1]
        assert any(int(tok) > 0 for tok in body.split()[:200])
