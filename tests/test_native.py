"""Native C++ helpers (PNG encoder, BVH builder) vs their Python
equivalents.  Skipped when the shared library hasn't been built
(``make -C native``)."""

import os

import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.image import read_png
from pathtracer_tpu.scene import SceneBuilder, Diffuse
from pathtracer_tpu.utils import native


pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library not built")


def test_native_png_roundtrip(tmp_path, rng_np):
    img = rng_np.integers(0, 256, (33, 17, 3), dtype=np.uint8)
    path = os.path.join(tmp_path, "native.png")
    assert native.write_png(path, img)
    np.testing.assert_array_equal(read_png(path), img)


def _soup(rng_np, n):
    sb = SceneBuilder()
    for _ in range(n):
        base = rng_np.uniform(-10, 10, 3)
        sb.add_triangle(base, base + rng_np.normal(0, 0.5, 3),
                        base + rng_np.normal(0, 0.5, 3), Diffuse(1))
    return sb.build()


def test_native_bvh_matches_python(rng_np):
    scene = _soup(rng_np, 200)
    py = pt.build_bvh(scene, use_native=False)
    nat = pt.build_bvh(scene, use_native=True)
    # Same candidate set + cost function -> identical tree structure
    # (up to equal-cost tie-breaks, which both break identically by
    # axis-then-position order).
    assert nat.num_nodes == py.num_nodes
    np.testing.assert_array_equal(np.asarray(nat.left), np.asarray(py.left))
    np.testing.assert_array_equal(np.asarray(nat.right), np.asarray(py.right))
    np.testing.assert_array_equal(np.asarray(nat.tri_start),
                                  np.asarray(py.tri_start))
    np.testing.assert_array_equal(np.asarray(nat.tri_idx),
                                  np.asarray(py.tri_idx))
    np.testing.assert_allclose(np.asarray(nat.lb), np.asarray(py.lb),
                               rtol=1e-6)
    assert nat.max_leaf == py.max_leaf and nat.depth == py.depth


def test_native_bvh_traversal_equivalence(rng_np):
    """The natively-built BVH must produce identical intersections."""
    import jax.numpy as jnp
    from pathtracer_tpu.ops import intersect as isect

    scene = _soup(rng_np, 120)
    nat = pt.build_bvh(scene, use_native=True)
    o = rng_np.uniform(-8, 8, (64, 3)).astype(np.float32)
    d = rng_np.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tb, ib = isect.intersect_brute(
        jnp.asarray(o), jnp.asarray(d), scene.v1, scene.v2, scene.v3)
    tv, iv = isect.intersect_bvh(
        jnp.asarray(o), jnp.asarray(d), nat, scene.v1, scene.v2, scene.v3,
        max_leaf=nat.max_leaf, stack_size=nat.stack_size())
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(iv))
