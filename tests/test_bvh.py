"""Structural invariants of the SAH BVH build (bvh.h:79-155 semantics)."""

import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.scene import SceneBuilder, Diffuse


def _soup(rng_np, n):
    sb = SceneBuilder()
    for _ in range(n):
        base = rng_np.uniform(-10, 10, 3)
        sb.add_triangle(base, base + rng_np.normal(0, 0.5, 3),
                        base + rng_np.normal(0, 0.5, 3), Diffuse(1))
    return sb.build()


def _check_invariants(scene, bvh):
    n = scene.num_tris
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    start = np.asarray(bvh.tri_start)
    end = np.asarray(bvh.tri_end)
    lb = np.asarray(bvh.lb)
    rt = np.asarray(bvh.rt)
    tri_idx = np.asarray(bvh.tri_idx)

    # tri_idx is a permutation
    assert sorted(tri_idx.tolist()) == list(range(n))
    # leaf iff left == right == -1 (bvh.h:25-27)
    assert np.all((left == -1) == (right == -1))
    # root covers everything
    assert start[0] == 0 and end[0] == n - 1
    # children partition the parent range contiguously (bvh.h:142-151)
    for i in range(len(left)):
        if left[i] != -1:
            li, ri = left[i], right[i]
            assert start[li] == start[i]
            assert end[li] + 1 == start[ri]
            assert end[ri] == end[i]
            # child boxes inside parent box
            assert np.all(lb[i] <= lb[li] + 1e-5)
            assert np.all(rt[i] >= rt[ri] - 1e-5)
    # node boxes contain their triangles
    v1 = np.asarray(scene.v1)[:n]
    v2 = np.asarray(scene.v2)[:n]
    v3 = np.asarray(scene.v3)[:n]
    t_lb = np.minimum(np.minimum(v1, v2), v3)
    t_rt = np.maximum(np.maximum(v1, v2), v3)
    for i in range(len(left)):
        if left[i] == -1:
            ids = tri_idx[start[i] : end[i] + 1]
            assert np.all(t_lb[ids] >= lb[i] - 1e-4)
            assert np.all(t_rt[ids] <= rt[i] + 1e-4)
    # node count bound M <= 2n (bvh.h:86)
    assert len(left) <= 2 * n


def test_invariants_cornell():
    _, scene = pt.cornell_box(res=(4, 4))
    bvh = pt.build_bvh(scene, use_native=False)
    _check_invariants(scene, bvh)
    assert bvh.depth >= 2  # 30 tris must split at least once


def test_invariants_random_soup(rng_np):
    scene = _soup(rng_np, 157)
    bvh = pt.build_bvh(scene, use_native=False)
    _check_invariants(scene, bvh)
    # SAH on a spread-out soup should build a real tree, not one big leaf
    assert bvh.max_leaf < 40
    assert bvh.depth >= 4


def test_tiny_scene_single_leaf_or_small():
    _, scene = pt.corner_scene(res=(4, 4))
    bvh = pt.build_bvh(scene, use_native=False)
    _check_invariants(scene, bvh)


def test_print_tree_runs():
    _, scene = pt.corner_scene(res=(4, 4))
    bvh = pt.build_bvh(scene, use_native=False)
    dump = pt.print_tree(bvh)
    assert "root" in dump and "tri: 0 -> 2" in dump
