"""Scene-DSL parser tests (grammar of parser.rs:326-335 + quirks)."""

import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu import parser
from raytracer_tpu.scene import DIFFUSE, METAL, DIELECTRIC, EMISSION


class TestCombinators:
    def test_skip_whitespace(self):
        assert parser.skip_whitespace("  \n\t x") == "x"
        assert parser.skip_whitespace("") == ""

    def test_get_identifier(self):
        rest, ident = parser.get_identifier("FOO_1 bar")
        assert ident == "FOO_1" and rest == " bar"

    def test_starts_with(self):
        assert parser.starts_with("sphere x", "sphere") == " x"
        with pytest.raises(parser.ParseError):
            parser.starts_with("x", "sphere")

    def test_parse_int(self):
        rest, v = parser.parse_int("123;")
        assert v == 123 and rest == ";"
        with pytest.raises(parser.ParseError):
            parser.parse_int("abc")

    def test_parse_float(self):
        rest, v = parser.parse_float("-1.5 x")
        assert v == -1.5 and rest == " x"
        rest, v = parser.parse_float("100.0;")
        assert v == 100.0
        # reference quirk (parser.rs:112-114): < 3 chars remaining is an error
        with pytest.raises(parser.ParseError):
            parser.parse_float("1")
        # double dot is an error (parser.rs:124)
        with pytest.raises(parser.ParseError):
            parser.parse_float("1.2.3")

    def test_parse_vec3(self):
        rest, v = parser.parse_vec3("1.0 -2.0 3.5 ;")
        assert v == (1.0, -2.0, 3.5)

    def test_skip_comment(self):
        assert parser.skip_comment("// hi\n// there\nx") == "x"
        with pytest.raises(parser.ParseError):
            parser.skip_comment("// unterminated")


class TestParseInput:
    def test_default_world(self, default_world):
        w = default_world
        # world.txt: 9 materials, 8 spheres, 0 triangles
        assert len(w.materials) == 9
        assert len(w.spheres) == 8
        assert len(w.triangles) == 0
        assert w.camera_origin == (0.0, 0.0, 0.0)
        assert abs(w.camera_aspect - 1.77778) < 1e-6
        # ground sphere first (world.txt:15)
        c, r, m = w.spheres[0]
        assert c == (0.0, -100.5, -1.0) and r == 100.0
        kinds = [m.kind for m in w.materials]
        assert kinds.count(DIFFUSE) == 5
        assert kinds.count(METAL) == 3
        assert kinds.count(DIELECTRIC) == 1

    def test_ffi_world_triangles(self, ffi_world):
        # examples/c_raytracer.rs:42-43
        assert len(ffi_world.triangles) == 2
        v0, v1, v2, m = ffi_world.triangles[0]
        assert v0 == (-0.1, -0.1, -0.5)

    def test_nul_termination(self):
        # lib.rs:38-40 (CStr) / examples/c_raytracer.rs:44 trailing \x00
        src = "camera origin 0.0 0.0 0.0 aspect 1.0;\x00garbage after nul"
        w = parser.parse_input(src)
        assert w.camera_aspect == 1.0

    def test_missing_camera(self):
        with pytest.raises(parser.ParseError) as e:
            parser.parse_input("material M : Diffuse color 1.0 1.0 1.0;")
        assert e.value.kind == parser.MISSING_CAMERA

    def test_unknown_material_reference(self):
        src = ("camera origin 0.0 0.0 0.0 aspect 1.0;\n"
               "sphere center 0.0 0.0 -1.0 radius 0.5 material NOPE;")
        with pytest.raises(parser.ParseError):
            parser.parse_input(src)

    def test_trailing_garbage(self):
        src = "camera origin 0.0 0.0 0.0 aspect 1.0; bogus"
        with pytest.raises(parser.ParseError):
            parser.parse_input(src)

    def test_emission_extension(self):
        src = ("camera origin 0.0 0.0 0.0 aspect 1.0;\n"
               "material L : Emission color 4.0 4.0 4.0;\n"
               "sphere center 0.0 2.0 -1.0 radius 0.5 material L;")
        w = parser.parse_input(src)
        assert w.materials[0].kind == EMISSION
        assert w.materials[0].color == (4.0, 4.0, 4.0)

    def test_comments_between_sections(self):
        src = ("// header\n"
               "camera origin 0.0 0.0 0.0 aspect 1.0;\n"
               "// mats\n"
               "material A : Diffuse color 1.0 0.0 0.0;\n"
               "// spheres\n"
               "sphere center 0.0 0.0 -1.0 radius 0.5 material A;\n"
               "// done\n")
        w = parser.parse_input(src)
        assert len(w.spheres) == 1

    def test_strict_section_order(self):
        # a sphere before materials ends the material section; the later
        # material is then trailing garbage (parser.rs:336-382)
        src = ("camera origin 0.0 0.0 0.0 aspect 1.0;\n"
               "sphere center 0.0 0.0 -1.0 radius 0.5 material A;\n")
        with pytest.raises(parser.ParseError):
            parser.parse_input(src)  # A not defined yet

    def test_to_scene_shapes(self, ffi_world):
        scene = ffi_world.to_scene()
        assert scene.num_spheres == 8
        assert scene.num_triangles == 2
        assert bool(scene.sphere_valid.all())
        assert bool(scene.tri_valid.all())
        assert scene.materials.count == 9

    def test_padding(self, default_world):
        scene = default_world.to_scene(pad_spheres_to=16, pad_triangles_to=8)
        assert scene.num_spheres == 16
        assert int(scene.sphere_valid.sum()) == 8
        assert scene.num_triangles == 8
        assert int(scene.tri_valid.sum()) == 0

    def test_parse_world_file(self, tmp_path):
        p = tmp_path / "w.txt"
        p.write_text("camera origin 0.0 0.0 0.0 aspect 1.0;")
        w = parser.parse_world(str(p))
        assert w.camera_aspect == 1.0
        with pytest.raises(parser.ParseError) as e:
            parser.parse_world(str(tmp_path / "missing.txt"))
        assert e.value.kind == parser.COULDNT_OPEN_FILE
