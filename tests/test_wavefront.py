"""Wavefront pipeline must agree with the megakernel path exactly: same
RNG streams, same math, only the execution schedule differs."""

import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.ops.wavefront import render_wavefront


def test_wavefront_matches_megakernel_corner():
    cam, scene = pt.corner_scene(res=(16, 16))
    wf = render_wavefront(cam, scene, samples=4, depth=3)
    ref = pt.render_film(cam, scene, samples=4, depth=3, backend="brute")
    np.testing.assert_allclose(np.asarray(wf), np.asarray(ref.data),
                               atol=1e-5)


def test_wavefront_matches_megakernel_bvh(rng_np):
    from pathtracer_tpu.scene import SceneBuilder, Diffuse, Emit
    sb = SceneBuilder()
    for _ in range(60):
        base = rng_np.uniform(-4, 4, 3)
        sb.add_triangle(base, base + rng_np.normal(0, 1, 3),
                        base + rng_np.normal(0, 1, 3), Diffuse(0.8))
    sb.add_triangle((-20, 10, -20), (20, 10, -20), (0, 10, 30), Emit(1))
    scene = sb.build()
    cam = pt.make_camera((0, 0, -12), (0, 0, 1), (0, 1, 0), (16, 16),
                         60 * pt.DEG2RAD, 1.0)
    bvh = pt.build_bvh(scene)
    wf = render_wavefront(cam, scene, samples=2, depth=3, bvh=bvh)
    ref = pt.render_film(cam, scene, samples=2, depth=3, backend="bvh",
                         bvh=bvh)
    np.testing.assert_allclose(np.asarray(wf), np.asarray(ref.data),
                               atol=1e-5)


def test_wavefront_compaction_invariance():
    """Compacting (or not) must not change the image — the permutation is
    tracked through the pixel ids."""
    cam, scene = pt.corner_scene(res=(8, 8))
    a = render_wavefront(cam, scene, samples=2, depth=4, compact_every=1)
    b = render_wavefront(cam, scene, samples=2, depth=4, compact_every=0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
