"""Procedural meshes, OBJ round-trip, and the large-scene BVH pipeline."""

import os

import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu import meshes, obj_loader


def test_sphere_triangle_count():
    sb = meshes.uv_sphere((0, 0, 0), 1.0, 8, 12)
    # 2 triangles per quad except single fans at the two poles
    assert len(sb) == 2 * 8 * 12 - 2 * 12


def test_obj_roundtrip(tmp_path):
    sb = meshes.uv_sphere((0, 0, 0), 1.0, 4, 6, pt.Diffuse(0.3, 0.6, 0.9))
    obj = os.path.join(tmp_path, "sphere.obj")
    meshes.save_obj(sb, obj)
    scene = obj_loader.load_obj_scene(obj, mtl_path=str(tmp_path))
    assert scene.num_tris == len(sb)
    np.testing.assert_allclose(np.asarray(scene.albedo)[0], [0.3, 0.6, 0.9],
                               atol=1e-6)
    ref = sb.build()
    # vertex data preserved (possibly reordered within the file; same here)
    np.testing.assert_allclose(np.asarray(scene.v1), np.asarray(ref.v1),
                               atol=1e-5)


def test_sphere_in_box_renders_with_bvh():
    cam, sb = meshes.sphere_in_box(n_lat=12, n_lon=16)
    scene = sb.build()
    assert scene.num_tris > 300  # beyond the reference GPU's MAX_TRIANGLES
    bvh = pt.build_bvh(scene)
    assert bvh.depth > 5
    import dataclasses
    cam = dataclasses.replace(cam, res=(24, 24))
    film = pt.render_film(cam, scene, samples=4, depth=3, backend="bvh",
                          bvh=bvh)
    img = np.asarray(film.data)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.2  # the light is visible
    # sphere silhouette: center pixels darker than light but lit
    assert img[8:16, 8:16].mean() > 0.001


def test_mesh_garden_scale():
    # the ~100k-tri stress scene (BASELINE config 4 upper end); the fast
    # grid=2 variant keeps the host-side build in test budget
    cam, sb = meshes.mesh_garden(grid=2)
    scene = sb.build()
    assert scene.num_tris > 4000
    # default tessellation lands in the ~100k class: count without build
    full_tris = 14 + 0  # room quads
    # count by generator arithmetic: sphere 2*n_lat*n_lon - 2*n_lon,
    # torus 2*n_major*n_minor, on a 7x7 alternating grid
    n_lat, n_lon = 22, 48
    sph = 2 * n_lat * n_lon - 2 * n_lon
    tor = 2 * n_lon * (n_lat + 2)
    n_s = sum(1 for i in range(7) for j in range(7) if (i + j) % 2 == 0)
    n_t = 49 - n_s
    full_tris = 14 + n_s * sph + n_t * tor
    assert 90_000 <= full_tris <= 120_000
