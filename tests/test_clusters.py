"""Cluster acceleration structure (clusters.py + ops/pallas/cluster_kernel).

The cluster path is the TPU re-architecture of the reference's BVH
traversal hot path (bvh.h:156-183, shader.h:153-193); these tests pin its
correctness contract against the brute-force oracle on CPU (Pallas
interpreter mode), including the ray-sorting driver and the padding rules.
"""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu import meshes
from pathtracer_tpu.clusters import PACK_PAD, build_clusters
from pathtracer_tpu.ops.intersect import intersect_brute
from pathtracer_tpu.ops.pallas.cluster_kernel import (
    _sort_keys,
    _spread3,
    intersect_clusters,
)


def _sphere_scene(nu=8, nv=12):
    cam, sb = meshes.sphere_in_box(nu, nv)
    return cam, sb.build()


def test_cluster_build_invariants():
    _, scene = _sphere_scene()
    cs = build_clusters(scene, max_tris=16)
    n = scene.num_tris

    # Every triangle appears exactly once in the packed order.
    tidm = np.asarray(cs.tid_map)
    assert tidm.shape[0] == n + PACK_PAD
    assert sorted(tidm[:n].tolist()) == list(range(n))
    assert (tidm[n:] == -1).all()

    # Padding rows are degenerate (zero edges -> rejected by |det| < EPS).
    td = np.asarray(cs.tri_data)
    assert (td[n:] == 0.0).all()

    # Cluster ranges tile [0, n) and respect the cut size (up to the
    # builder's leaf bound).
    starts = np.asarray(cs.start)
    counts = np.asarray(cs.count)
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + counts[:-1]).all()
    assert starts[-1] + counts[-1] == n
    assert cs.max_count == counts.max()

    # Each cluster's AABB contains its triangles' vertices.
    bounds = np.asarray(cs.bounds)
    for ci in range(cs.num_clusters):
        s, c = starts[ci], counts[ci]
        v1 = td[s : s + c, 0:3]
        v2 = v1 + td[s : s + c, 3:6]
        v3 = v1 + td[s : s + c, 6:9]
        verts = np.concatenate([v1, v2, v3], axis=0)
        assert (verts >= bounds[ci, 0:3] - 1e-4).all()
        assert (verts <= bounds[ci, 3:6] + 1e-4).all()


def test_spread3_is_morton_spacing():
    for x in (0, 1, 0b101010, 63):
        y = int(_spread3(jnp.int32(x)))
        for b in range(6):
            assert ((y >> (3 * b)) & 1) == ((x >> b) & 1)
        # no stray bits
        assert y & ~0b1001001001001001 == 0


def test_sort_keys_octants_distinct():
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], jnp.float32)
    keys = np.asarray(_sort_keys(o, d, jnp.zeros(3), jnp.ones(3)))
    assert len(set(keys.tolist())) == 8


def _random_rays(scene_lo, scene_hi, R, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(scene_lo, scene_hi, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_intersect_clusters_matches_brute():
    _, scene = _sphere_scene()
    cs = build_clusters(scene, max_tris=16)
    ro, rd = _random_rays(50, 450, 700)  # 700: exercises tile padding

    t_ref, tid_ref = intersect_brute(ro, rd, scene.v1, scene.v2, scene.v3)
    t_cl, tid_cl = intersect_clusters(ro, rd, cs, interpret=True)

    np.testing.assert_array_equal(np.asarray(tid_cl), np.asarray(tid_ref))
    hit = np.asarray(tid_ref) >= 0
    np.testing.assert_allclose(np.asarray(t_cl)[hit],
                               np.asarray(t_ref)[hit], rtol=2e-3)
    assert np.all(np.asarray(t_cl)[~hit] >= 1e29)


def test_intersect_clusters_unsorted_variant():
    _, scene = _sphere_scene(6, 8)
    cs = build_clusters(scene, max_tris=8)
    ro, rd = _random_rays(50, 450, 512, seed=3)
    t_s, tid_s = intersect_clusters(ro, rd, cs, interpret=True,
                                    sort_rays=True)
    t_u, tid_u = intersect_clusters(ro, rd, cs, interpret=True,
                                    sort_rays=False)
    np.testing.assert_array_equal(np.asarray(tid_s), np.asarray(tid_u))
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_u), rtol=1e-6)


def test_render_cluster_backend_matches_brute():
    cam, scene = _sphere_scene(6, 8)
    import dataclasses
    cam = dataclasses.replace(cam, res=(16, 16))
    ref = pt.render_film(cam, scene, samples=2, depth=3, backend="brute")
    got = pt.render_film(cam, scene, samples=2, depth=3, backend="cluster")
    # Identical RNG streams; intersection differs only by the approximate
    # reciprocal (~1 ulp t differences can flip no sample decisions except
    # exactly at accept boundaries).
    np.testing.assert_allclose(np.asarray(got.data), np.asarray(ref.data),
                               atol=2e-4)
