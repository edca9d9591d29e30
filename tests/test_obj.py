"""OBJ/MTL import tests (BVH::load_obj parity, bvh.h:184-242)."""

import os
import textwrap

import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu import obj_loader
from pathtracer_tpu import materials as mat


@pytest.fixture
def obj_dir(tmp_path):
    (tmp_path / "scene.mtl").write_text(textwrap.dedent("""\
        newmtl red_wall
        Kd 1.0 0.0 0.0
        Ka 0 0 0
        illum 1

        newmtl lamp
        Ka 2.0 2.0 2.0
        Kd 0 0 0
        illum 2

        newmtl weird
        Kd 0.1 0.2 0.3
        illum 7
    """))
    (tmp_path / "scene.obj").write_text(textwrap.dedent("""\
        mtllib scene.mtl
        v 0 0 0
        v 1 0 0
        v 0 1 0
        v 1 1 0
        usemtl red_wall
        f 1 2 3
        usemtl lamp
        f 2 4 3
        usemtl weird
        f 1 2 4
    """))
    return tmp_path


def test_load_obj_materials(obj_dir):
    scene = obj_loader.load_obj_scene(
        str(obj_dir / "scene.obj"), mtl_path=str(obj_dir))
    assert scene.num_tris == 3
    mt = np.asarray(scene.mat_type)
    # illum 1 -> DIFFUSE(Kd)
    assert mt[0] == mat.DIFFUSE
    np.testing.assert_allclose(np.asarray(scene.albedo)[0], [1, 0, 0])
    # illum 2 -> EMIT(Ka)
    assert mt[1] == mat.EMIT
    np.testing.assert_allclose(np.asarray(scene.emit)[1], [2, 2, 2])
    # unknown illum -> Diffuse(0.5) fallback (bvh.h:233-237)
    assert mt[2] == mat.DIFFUSE
    np.testing.assert_allclose(np.asarray(scene.albedo)[2], [0.5, 0.5, 0.5])


def test_load_obj_quad_triangulation(tmp_path):
    (tmp_path / "q.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    scene = obj_loader.load_obj_scene(str(tmp_path / "q.obj"))
    assert scene.num_tris == 2  # fan triangulation
    strict = obj_loader.load_obj(
        str(tmp_path / "q.obj"), strict_reference_triangulation=True).build()
    assert strict.num_tris == 1  # reference keeps only the first 3 verts


def test_load_obj_negative_indices(tmp_path):
    (tmp_path / "n.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    scene = obj_loader.load_obj_scene(str(tmp_path / "n.obj"))
    assert scene.num_tris == 1
    np.testing.assert_allclose(np.asarray(scene.v2)[0], [1, 0, 0])


def test_load_obj_renders(obj_dir):
    """End-to-end: an OBJ scene goes through the full pipeline."""
    scene = obj_loader.load_obj_scene(
        str(obj_dir / "scene.obj"), mtl_path=str(obj_dir))
    cam = pt.make_camera((0.5, 0.5, 2.5), (0, 0, -1), (0, 1, 0), (8, 8),
                         60 * pt.DEG2RAD, 1.0)
    film = pt.render_film(cam, scene, samples=4, depth=3)
    img = np.asarray(film.data)
    assert np.all(np.isfinite(img)) and img.max() > 0
