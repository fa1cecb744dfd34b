"""OBJ mesh loading (models/obj.py) — the bulk-geometry on-ramp for
BASELINE config 3 ("low-poly OBJ, ~10k tris")."""

import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.models import obj


CUBE_FACE = """\
# two triangles, slash syntax + comments
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1/1/1 2/2/2 3/3/3
f 1 3 4
"""


class TestParse:
    def test_triangles_and_slash_syntax(self):
        tris = obj.parse_obj(CUBE_FACE)
        assert len(tris) == 2
        (v0, v1, v2, m) = tris[0]
        assert v0 == (0, 0, 0) and v1 == (1, 0, 0) and v2 == (1, 1, 0)
        assert m == 0

    def test_quad_fan_triangulation(self):
        src = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
        tris = obj.parse_obj(src)
        assert len(tris) == 2
        assert tris[0][0] == tris[1][0] == (0, 0, 0)   # shared fan apex
        assert tris[1][1] == (1, 1, 0)

    def test_negative_relative_indices(self):
        src = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
        tris = obj.parse_obj(src)
        assert tris[0][:3] == ((0, 0, 0), (1, 0, 0), (0, 1, 0))

    def test_scale_translate_material(self):
        tris = obj.parse_obj("v 1 1 1\nv 2 0 0\nv 0 2 0\nf 1 2 3\n",
                             material=5, scale=2.0, translate=(10, 0, 0))
        assert tris[0][0] == (12, 2, 2)
        assert tris[0][3] == 5

    def test_ignores_unsupported_tags(self):
        src = ("mtllib a.mtl\no thing\ng grp\ns off\nusemtl m\n"
               "vt 0 0\nvn 0 0 1\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        assert len(obj.parse_obj(src)) == 1

    @pytest.mark.parametrize("bad", [
        "v 1 2\n",                       # short vertex
        "v a b c\n",                     # non-numeric
        "v 0 0 0\nf 1 2\n",              # short face
        "v 0 0 0\nf 1 2 9\n",            # out of range
        "v 0 0 0\nf 1 x 1\n",            # bad index
    ])
    def test_errors(self, bad):
        with pytest.raises(obj.ObjError):
            obj.parse_obj(bad)


class TestRoundTrip:
    def test_dump_parse_identity(self):
        tris = rt.models.icosphere_mesh((0.0, 0.0, -1.0), 0.5, 3, 1)
        text = obj.dump_obj(tris)
        back = obj.parse_obj(text, 3)
        a = np.asarray([t[:3] for t in tris], np.float32)
        b = np.asarray([t[:3] for t in back], np.float32)
        np.testing.assert_allclose(a, b, rtol=1e-6)
        assert all(t[3] == 3 for t in back)

    def test_load_obj_file(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        assert len(obj.load_obj(str(p))) == 1

    def test_bounds(self):
        tris = obj.parse_obj("v -1 0 2\nv 1 0 0\nv 0 3 0\nf 1 2 3\n")
        lo, hi = obj.obj_bounds(tris)
        np.testing.assert_array_equal(lo, [-1, 0, 0])
        np.testing.assert_array_equal(hi, [1, 3, 2])


class TestObjScene:
    def test_obj_mesh_scene_shape(self):
        scene, cam = rt.models.obj_mesh_scene()
        assert scene.num_triangles == 10240
        assert scene.num_spheres == 1

    def test_obj_scene_renders(self):
        scene, cam = rt.models.obj_mesh_scene()
        img, segs = rt.render_linear(scene, cam, width=8, height=6,
                                     samples_per_pixel=1, depth=2)
        a = np.asarray(img)
        assert np.isfinite(a).all() and a.max() > 0
