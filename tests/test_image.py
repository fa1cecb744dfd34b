"""Framebuffer / PPM I/O tests (image.rs:59-81 format parity)."""

import numpy as np
import pytest

from raytracer_tpu import image


class TestPPM:
    def test_header_and_triplets(self, tmp_path):
        fb = image.new_framebuffer(3, 2)
        fb[0, 0] = [255, 0, 0, 255]
        fb[0, 1] = [0, 255, 0, 255]
        fb[0, 2] = [0, 0, 255, 255]
        fb[1, 0] = [255, 255, 0, 255]
        fb[1, 1] = [255, 255, 255, 255]
        fb[1, 2] = [0, 0, 0, 255]
        p = tmp_path / "img.ppm"
        image.write_ppm(fb, str(p))
        text = p.read_text()
        lines = text.splitlines()
        # exact reference format (image.rs:68-77): header then r g b per line
        assert lines[0] == "P3"
        assert lines[1] == "3 2"
        assert lines[2] == "255"
        assert lines[3] == "255 0 0"
        assert lines[4] == "0 255 0"
        assert lines[5] == "0 0 255"
        assert lines[6] == "255 255 0"
        assert lines[7] == "255 255 255"
        assert lines[8] == "0 0 0"

    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        fb = rng.integers(0, 256, size=(7, 5, 4), dtype=np.uint8)
        fb[..., 3] = 255
        p = tmp_path / "rt.ppm"
        image.write_ppm(fb, str(p))
        back = image.read_ppm(str(p))
        assert np.array_equal(back[..., :3], fb[..., :3])
        assert (back[..., 3] == 255).all()

    def test_stdout(self, capsys):
        fb = image.new_framebuffer(1, 1)
        image.write_ppm(fb, None)
        out = capsys.readouterr().out
        assert out.startswith("P3\n1 1\n255\n0 0 0")

    def test_png_writer(self, tmp_path):
        fb = image.new_framebuffer(4, 4)
        fb[..., 0] = 128
        fb[..., 3] = 255
        p = tmp_path / "x.png"
        image.write_png(fb, str(p))
        data = p.read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert b"IHDR" in data and b"IEND" in data


class TestFramebuffer:
    def test_new_is_zero(self):
        fb = image.new_framebuffer(5, 3)
        assert fb.shape == (3, 5, 4)
        assert (fb == 0).all()
