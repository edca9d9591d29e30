"""Scalar-scheduled beam megakernel (ops/pallas/beam_kernel.py).

Correctness strategy: depth-1 renders are BIT-EXACT against the oracle
backends (camera jitter uses the identical per-(pixel,sample) streams and
a depth-1 image is pure first-hit emission — no bounce sampling), which
exercises the whole traversal machinery: Morton tiling, supercluster and
cluster sweeps, the scalar walk, phased t-culling, and the run engine.
Deeper bounces change the SAMPLING discipline (tile-shared uniforms), so
they are validated statistically.
"""

import dataclasses

import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu import meshes
from pathtracer_tpu.clusters import build_beam_accel
from pathtracer_tpu.ops.pallas import beam_kernel


def _sphere_cam(res):
    cam, sb = meshes.sphere_in_box(10, 20)  # 392-tri sphere: fast on CPU
    scene = sb.build()
    return dataclasses.replace(cam, res=(res, res)), scene


def test_depth1_bit_exact_cornell():
    cam, scene = pt.cornell_box(res=(64, 64))
    fb = beam_kernel.render_film_beam(cam, scene, samples=2, depth=1,
                                      seed=3, interpret=True)
    fr = pt.render_film(cam, scene, samples=2, depth=1, seed=3,
                        backend="brute")
    np.testing.assert_array_equal(np.asarray(fb.data), np.asarray(fr.data))


def test_depth1_bit_exact_mesh_scene():
    cam, scene = _sphere_cam(32)
    fb = beam_kernel.render_film_beam(cam, scene, samples=1, depth=1,
                                      seed=2, interpret=True)
    fr = pt.render_film(cam, scene, samples=1, depth=1, seed=2,
                        backend="bvh")
    np.testing.assert_array_equal(np.asarray(fb.data), np.asarray(fr.data))


def test_depth1_bit_exact_specular_scene():
    cam, scene = pt.modified_cornell(0.05, res=(32, 32))
    fb = beam_kernel.render_film_beam(cam, scene, samples=1, depth=1,
                                      seed=2, interpret=True)
    fr = pt.render_film(cam, scene, samples=1, depth=1, seed=2,
                        backend="brute")
    np.testing.assert_array_equal(np.asarray(fb.data), np.asarray(fr.data))


def test_depth1_nonvacuous():
    # the light panel must actually be visible, else the exactness tests
    # would pass on all-black images
    cam, scene = pt.cornell_box(res=(64, 64))
    fb = beam_kernel.render_film_beam(cam, scene, samples=2, depth=1,
                                      seed=3, interpret=True)
    assert np.asarray(fb.data).max() > 0.5


def test_deep_bounce_statistical():
    """Tile-shared sampling is unbiased per pixel; at moderate spp the
    image mean must land near the oracle's (loose bound: the shared
    uniforms correlate the whole 32^2 test tile, so the image mean only
    tightens like 1/sqrt(spp))."""
    cam, scene = pt.cornell_box(res=(32, 32))
    fb = beam_kernel.render_film_beam(cam, scene, samples=192, depth=4,
                                      seed=5, interpret=True)
    fr = pt.render_film(cam, scene, samples=192, depth=4, seed=5,
                        backend="brute")
    a = float(np.asarray(fb.data).mean())
    b = float(np.asarray(fr.data).mean())
    assert 0.5 < a / b < 2.0, (a, b)


def test_morton_mapping_roundtrip():
    for w, h in ((32, 32), (16, 64)):
        m = beam_kernel._morton_to_raster(w, h)
        assert sorted(m.tolist()) == list(range(w * h))


def test_beam_accel_invariants():
    cam, scene = _sphere_cam(32)
    acc = build_beam_accel(scene)
    C, S = acc.num_clusters, acc.num_superclusters
    tid = np.asarray(acc.tid_map)
    # every real triangle appears exactly once in the packed rows
    real = tid[tid >= 0]
    assert sorted(real.tolist()) == list(range(scene.num_tris))
    # clusters own exactly ctris rows; cluster AABBs contain their tris
    tc = np.asarray(acc.tri_cols)
    clb = np.asarray(acc.cl_bounds)
    for c in range(C):
        rows = slice(c * acc.ctris, (c + 1) * acc.ctris)
        ids = tid[rows]
        n = (ids >= 0).sum()
        assert np.all(ids[:n] >= 0) and np.all(ids[n:] == -1)
        v1 = tc[rows][:n, 0:3]
        assert np.all(v1 >= clb[c, 0:3] - 1e-4)
        assert np.all(v1 <= clb[c, 3:6] + 1e-4)
    # supercluster ranges tile the cluster list
    scf = np.asarray(acc.sc_first)
    scn = np.asarray(acc.sc_ncl)
    assert scf[0] == 0 and scf[-1] + scn[-1] == C
    assert np.all(scf[1:] == scf[:-1] + scn[:-1])
    # octant orders are permutations
    sco = np.asarray(acc.sc_order)
    for o in range(8):
        assert sorted(sco[o].tolist()) == list(range(S))


def test_render_film_backend_beam():
    cam, scene = pt.cornell_box(res=(32, 32))
    fb = pt.render_film(cam, scene, samples=2, depth=1, seed=3,
                        backend="beam")
    fr = pt.render_film(cam, scene, samples=2, depth=1, seed=3,
                        backend="brute")
    np.testing.assert_array_equal(np.asarray(fb.data), np.asarray(fr.data))
    with pytest.raises(ValueError, match="checkpoint"):
        pt.render_film(cam, scene, samples=2, depth=1, backend="beam",
                       checkpoint="/tmp/nope.npz")


def test_phased_walk_bit_exact(monkeypatch):
    """The phased two-ended walk + cursor-limited re-sweep is off by
    default (measured slower on the bench scene) but must stay correct:
    budgeted phases re-cull with the updated best_t and may never drop a
    cluster a ray still needs."""
    monkeypatch.setattr(beam_kernel, "PHASE_BUDGETS", (4, 1 << 30))
    beam_kernel._launch.clear_cache()
    try:
        cam, scene = _sphere_cam(32)
        fb = beam_kernel.render_film_beam(cam, scene, samples=1, depth=2,
                                          seed=2, interpret=True)
        monkeypatch.setattr(beam_kernel, "PHASE_BUDGETS", (1 << 30,))
        beam_kernel._launch.clear_cache()
        fr = beam_kernel.render_film_beam(cam, scene, samples=1, depth=2,
                                          seed=2, interpret=True)
        np.testing.assert_allclose(np.asarray(fb.data),
                                   np.asarray(fr.data), atol=1e-6)
    finally:
        beam_kernel._launch.clear_cache()


def test_depth1_bit_exact_nonsquare():
    """W != H films use stacked Morton squares (beam_kernel Morton
    decode); exercise that path end-to-end, not just the permutation."""
    cam, scene = pt.cornell_box(res=(32, 64))
    fb = beam_kernel.render_film_beam(cam, scene, samples=1, depth=1,
                                      seed=4, interpret=True)
    fr = pt.render_film(cam, scene, samples=1, depth=1, seed=4,
                        backend="brute")
    np.testing.assert_array_equal(np.asarray(fb.data), np.asarray(fr.data))


def test_beam_rejects_incompatible_shapes():
    cam, scene = pt.cornell_box(res=(48, 48))
    with pytest.raises(ValueError, match="power-of-two"):
        beam_kernel.render_film_beam(cam, scene, samples=1, interpret=True)
    cam2, _ = pt.cornell_box(res=(64, 96))
    with pytest.raises(ValueError, match="multiple"):
        beam_kernel.render_film_beam(cam2, scene, samples=1, interpret=True)
