"""OBJ/MTL loader tests: pure-Python parser, native parser parity, MTL
material resolution, dedup semantics."""

import os
import textwrap

import numpy as np
import pytest

from realtimeraytracer_tpu.scene import obj_loader

OBJ = textwrap.dedent("""\
    # test scene
    mtllib scene.mtl
    v 0 0 0
    v 1 0 0
    v 0 1 0
    v 1 1 0
    vt 0 0
    vt 1 0
    vt 0 1
    vn 0 0 1
    usemtl red
    f 1/1/1 2/2/1 3/3/1
    o lid
    usemtl shiny
    f 2 4 3
    f -3 -1 -2
""")

MTL = textwrap.dedent("""\
    newmtl red
    Kd 0.9 0.1 0.1
    Ks 0.25
    metallic 0.75
    newmtl shiny
    Kd 0.2 0.2 0.8
    Ks 0.9
""")


@pytest.fixture
def obj_dir(tmp_path):
    (tmp_path / "scene.obj").write_text(OBJ)
    (tmp_path / "scene.mtl").write_text(MTL)
    return tmp_path


class TestParse:
    @pytest.mark.parametrize("native", [False, True])
    def test_counts_and_indices(self, obj_dir, native):
        if native:
            from realtimeraytracer_tpu.utils.native import load_library

            if load_library() is None:
                pytest.skip("native library not built")
        pos, tex, nrm, shapes, mtllibs = obj_loader.parse_obj(
            str(obj_dir / "scene.obj"), allow_native=native)
        assert pos.shape == (4, 3)
        assert tex.shape == (3, 2)
        assert nrm.shape == (1, 3)
        assert mtllibs == ["scene.mtl"]
        assert len(shapes) == 2
        assert shapes[0].material == "red"
        assert shapes[1].material == "shiny"
        assert len(shapes[0].faces) == 1
        assert len(shapes[1].faces) == 2
        # Negative indices resolve relative to the current position count.
        assert shapes[1].faces[1][0][0] == 1  # -3 with 4 verts -> index 1

    def test_native_matches_python(self, obj_dir):
        from realtimeraytracer_tpu.utils.native import load_library

        if load_library() is None:
            pytest.skip("native library not built")
        a = obj_loader.parse_obj(str(obj_dir / "scene.obj"), allow_native=False)
        b = obj_loader.parse_obj(str(obj_dir / "scene.obj"), allow_native=True)
        np.testing.assert_allclose(a[0], b[0])
        np.testing.assert_allclose(a[1], b[1])

        def norm(shapes):
            return [
                (s.material, [tuple(tuple(int(x) for x in c) for c in f)
                              for f in s.faces])
                for s in shapes
            ]

        assert norm(a[3]) == norm(b[3])


class TestMaterials:
    def test_mtl_resolution(self, obj_dir):
        meshes = obj_loader.load_obj_mtl(str(obj_dir / "scene.obj"))
        assert len(meshes) == 2
        m0 = meshes[0].material
        np.testing.assert_allclose(m0.color, (0.9, 0.1, 0.1))
        assert m0.specular == pytest.approx(0.25)
        assert m0.metallic == pytest.approx(0.75)
        m1 = meshes[1].material
        assert m1.specular == pytest.approx(0.9)

    def test_dedup_shares_corners(self, obj_dir):
        mesh = obj_loader.load_obj(str(obj_dir / "scene.obj"))
        # 3 unique corners in shape 1 + reused corners across shape 2's two
        # faces; with distinct (v,vt,vn) triples, total unique < total corners.
        assert len(mesh.faces) == 3
        assert len(mesh.vertices) < 9

    def test_scene_integration(self, obj_dir):
        from realtimeraytracer_tpu.scene.scene import Scene

        scene = Scene()
        obj_loader.load_obj_scene(scene, str(obj_dir / "scene.obj"))
        gpu = scene.compile()
        assert gpu.faces.shape[0] == 3
