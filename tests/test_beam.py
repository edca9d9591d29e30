"""Scalar-scheduled beam megakernel (ops/pallas/beam_kernel.py).

Correctness strategy: depth-1 renders are BIT-EXACT against the oracle
backends (camera jitter uses the identical per-(pixel,sample) streams and
a depth-1 image is pure first-hit emission — no bounce sampling), which
exercises the whole traversal machinery: 64x64 Morton-square tiling with
arbitrary-resolution padding, supercluster and positional-chunked cluster
sweeps, the scalar walk, and the run engine.  Deeper bounces change the
SAMPLING discipline (tile-shared uniforms), so they are validated
statistically.
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


def _sphere_cam_lit(res):
    """Sphere scene with the camera tilted UP so the ceiling light panel
    is on screen: from the stock forward the nearly-edge-on panel
    projects between the pixel centers of small films, depth-1 images
    are all black, and low-spp beam images are black too (every tile's
    few shared bounce draws miss the light) — bit-exactness tests then
    compare black to black, vacuously.  Tests that assert image equality
    at tiny sample counts use this camera and assert non-vacuity."""
    from pathtracer_tpu.camera import make_camera
    from pathtracer_tpu.linalg import DEG2RAD

    _, sb = meshes.sphere_in_box(10, 20)
    scene = sb.build()
    cam = make_camera((250, 250, -420), (0, 0.35, 1), (0, 1, 0),
                      (res, res), 60 * DEG2RAD, 1.0)
    return cam, scene


def test_depth1_bit_exact_cornell():
    cam, scene = pt.cornell_box(res=(64, 64))
    fb = beam_kernel.render_film_beam(cam, scene, samples=2, depth=1,
                                      seed=3, interpret=True)
    fr = pt.render_film(cam, scene, samples=2, depth=1, seed=3,
                        backend="brute")
    np.testing.assert_array_equal(np.asarray(fb.data), np.asarray(fr.data))


def test_depth1_bit_exact_mesh_scene():
    cam, scene = _sphere_cam_lit(32)
    fb = beam_kernel.render_film_beam(cam, scene, samples=1, depth=1,
                                      seed=2, interpret=True)
    fr = pt.render_film(cam, scene, samples=1, depth=1, seed=2,
                        backend="bvh")
    assert np.asarray(fr.data).max() > 0  # the light must be visible
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
    for wp, hp in ((64, 64), (128, 64), (192, 320)):
        m = beam_kernel._sq_to_raster(wp, hp)
        assert sorted(m.tolist()) == list(range(wp * hp))


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


def test_beam_checkpoint_resume(tmp_path):
    """Beam renders checkpoint at sample-block boundaries and resume
    bit-identically (the round-3 'beam cannot checkpoint' cliff)."""
    cam, scene = _sphere_cam_lit(32)
    ck = str(tmp_path / "beam_ck")
    full = pt.render_film(cam, scene, samples=4, depth=2, seed=3,
                          backend="beam")
    assert np.asarray(full.data).max() > 0  # non-vacuous resume compare
    with pytest.raises(KeyboardInterrupt):
        pt.render_film(cam, scene, samples=4, depth=2, seed=3,
                       backend="beam", checkpoint=ck, _abort_after=1)
    resumed = pt.render_film(cam, scene, samples=4, depth=2, seed=3,
                             backend="beam", checkpoint=ck)
    np.testing.assert_array_equal(np.asarray(resumed.data),
                                  np.asarray(full.data))


def test_chunked_walk_bit_exact(monkeypatch):
    """The positional cluster plane processes queued superclusters in
    2048-slot chunks; forcing tiny chunks must not change a single bit
    (chunk boundaries only regroup the sweep/walk/engine trio — and
    later chunks get slab-culled by earlier best_t, which may only
    remove provably occluded clusters)."""
    cam, scene = _sphere_cam_lit(32)
    monkeypatch.setattr(beam_kernel, "CHUNK_CAP", 64)
    beam_kernel._launch.clear_cache()
    try:
        fb = beam_kernel.render_film_beam(cam, scene, samples=1, depth=2,
                                          seed=2, interpret=True)
        monkeypatch.undo()
        beam_kernel._launch.clear_cache()
        fr = beam_kernel.render_film_beam(cam, scene, samples=1, depth=2,
                                          seed=2, interpret=True)
        assert np.asarray(fr.data).max() > 0  # non-vacuous comparison
        np.testing.assert_array_equal(np.asarray(fb.data),
                                      np.asarray(fr.data))
    finally:
        beam_kernel._launch.clear_cache()


def test_depth1_bit_exact_nonsquare():
    """W != H films span multiple Morton squares per row and column;
    exercise the square decode end-to-end, not just the permutation."""
    cam, scene = pt.cornell_box(res=(32, 64))
    fb = beam_kernel.render_film_beam(cam, scene, samples=1, depth=1,
                                      seed=4, interpret=True)
    fr = pt.render_film(cam, scene, samples=1, depth=1, seed=4,
                        backend="brute")
    np.testing.assert_array_equal(np.asarray(fb.data), np.asarray(fr.data))


def test_depth1_bit_exact_arbitrary_shapes():
    """Any resolution renders via 64x64-square padding + host crop (the
    round-3 power-of-two/multiple-of-width cliffs are gone)."""
    for res in ((48, 48), (64, 96), (200, 72), (33, 65)):
        cam, scene = pt.cornell_box(res=res)
        fb = beam_kernel.render_film_beam(cam, scene, samples=1, depth=1,
                                          seed=4, interpret=True)
        fr = pt.render_film(cam, scene, samples=1, depth=1, seed=4,
                            backend="brute")
        np.testing.assert_array_equal(np.asarray(fb.data),
                                      np.asarray(fr.data),
                                      err_msg=f"res={res}")


def test_garden_accel_invariants():
    """The ~100k-tri mesh_garden class builds a valid beam accel (auto
    supercluster sizing keeps S <= 126; positional chunking has no
    cluster-count cap).  grid=2 keeps the host build in test budget."""
    cam, sb = meshes.mesh_garden(grid=2)
    scene = sb.build()
    acc = build_beam_accel(scene)
    assert acc.num_superclusters <= beam_kernel.MAX_BEAM_SC
    tid = np.asarray(acc.tid_map)
    real = tid[tid >= 0]
    assert sorted(real.tolist()) == list(range(scene.num_tris))
    scf = np.asarray(acc.sc_first)
    scn = np.asarray(acc.sc_ncl)
    assert scf[0] == 0 and scf[-1] + scn[-1] == acc.num_clusters
    assert np.all(scf[1:] == scf[:-1] + scn[:-1])


def test_many_materials_inline_bit_exact():
    """Scenes with more than 64 unique materials switch to inline
    per-triangle materials (clusters.py) — the old hard cap is gone, and
    the inline engine path stays bit-exact at depth 1."""
    from pathtracer_tpu.scene import Diffuse, Emit, SceneBuilder
    sb = SceneBuilder()
    s = 100.0
    sb.add_quad(((s, s - 1, 30), (s, s - 1, 70), (0, s - 1, 70),
                 (0, s - 1, 30)), Emit(1))
    for i in range(70):
        x = (i % 10) * 10.0
        z = (i // 10) * 12.0 + 5.0
        sb.add_quad(((x, 0, z), (x + 9, 0, z), (x + 9, 0, z + 10),
                     (x, 0, z + 10)), Diffuse(0.1 + 0.012 * i, 0.5, 0.9))
    scene = sb.build()
    acc = build_beam_accel(scene)
    assert acc.mats_inline
    from pathtracer_tpu.camera import make_camera
    from pathtracer_tpu.linalg import DEG2RAD
    cam = make_camera((50, 60, -60), (0, -0.5, 1), (0, 1, 0), (32, 32),
                      70 * DEG2RAD, 1.0)
    fb = beam_kernel.render_film_beam(cam, scene, samples=2, depth=1,
                                      seed=3, accel=acc, interpret=True)
    fr = pt.render_film(cam, scene, samples=2, depth=1, seed=3,
                        backend="brute")
    np.testing.assert_array_equal(np.asarray(fb.data), np.asarray(fr.data))


def test_beam_noise_contract_vs_cluster():
    """CI guard for the README's noise-equivalence claim (round-4 verdict
    item 6): at equal spp the coherent-beam sampling and the per-pixel
    -independent cluster sampling converge at the SAME rate — PSNR vs a
    committed converged truth (8192 spp, scratch/make_sphere_truth.py)
    must match within a small margin.  Tile-correlated noise changes the
    noise STRUCTURE (blotches vs grain), not its magnitude."""
    import os

    truth_path = os.path.join(os.path.dirname(__file__), "goldens",
                              "sphere64_truth.npz")
    truth = np.load(truth_path)["film"]
    cam, scene = _sphere_cam(64)

    def mse(img):
        return float(np.mean((np.asarray(img) - truth) ** 2))

    def psnr(m):
        peak = float(truth.max())
        return 10.0 * np.log10(peak * peak / m)

    # At 64^2 the film is only TWO 2048-pixel beam tiles, so a single
    # seed's image error is dominated by a handful of shared draws and
    # its PSNR wanders by multiple dB; aggregate the mse over seeds to
    # estimate the CONVERGENCE RATE (what the contract is about) rather
    # than one draw of the noise.
    seeds = (9, 23, 57)
    mb = np.mean([mse(pt.render_film(cam, scene, samples=256, depth=5,
                                     seed=s, backend="beam").data)
                  for s in seeds])
    mc = np.mean([mse(pt.render_film(cam, scene, samples=256, depth=5,
                                     seed=s, backend="cluster").data)
                  for s in seeds])
    pb, pc = psnr(mb), psnr(mc)
    # both must beat the all-black frame (non-vacuity: the renders carry
    # signal, not just a magnitude match — this dark scene's 64-spp
    # noise scores BELOW black, hence 256 spp) and land within 2.5 dB of
    # EACH OTHER.  Measured here: 10.2 vs 11.8 dB — the residual ~1.5 dB
    # is the mse ESTIMATOR's own noise (a 64^2 film is only two beam
    # tiles, so the beam image's error has ~2 x spp effective draws per
    # seed); a genuinely broken sampler shows 5-10 dB.  The README's TPU
    # measurement at higher spp/res: 21.03 vs 21.15 dB.
    p_black = psnr(mse(np.zeros_like(truth)))
    assert pb > p_black + 1.5 and pc > p_black + 1.5, (pb, pc, p_black)
    assert abs(pb - pc) < 2.5, (pb, pc)


def test_staged_traversal_bit_exact(monkeypatch):
    """Round-5 staged traversal (adaptive positional chunks with best-t
    feedback, per-window supercluster re-tests, group-summary planes)
    claims BIT-identical images; production only engages it at >=
    STAGED_MIN_CL clusters, so force staged=True here — and shrink the
    chunk/window budgets so a small scene actually exercises multiple
    adaptive chunks and window re-sweeps, not just the first chunk."""
    cam, scene = _sphere_cam_lit(32)
    monkeypatch.setattr(beam_kernel, "STAGED_CHUNK0", 8)
    monkeypatch.setattr(beam_kernel, "STAGED_WINDOW", 4)
    beam_kernel._launch.clear_cache()
    try:
        fs = beam_kernel.render_film_beam(cam, scene, samples=2, depth=3,
                                          seed=2, staged=True,
                                          interpret=True)
        f1 = beam_kernel.render_film_beam(cam, scene, samples=1, depth=1,
                                          seed=4, staged=True,
                                          interpret=True)
        monkeypatch.undo()
        beam_kernel._launch.clear_cache()
        fl = beam_kernel.render_film_beam(cam, scene, samples=2, depth=3,
                                          seed=2, staged=False,
                                          interpret=True)
        # deep bounces: staged == legacy, bit for bit (the chunks only
        # regroup sweep/walk/engine and cull via the monotone best_t)
        assert np.asarray(fl.data).max() > 0  # non-vacuous comparison
        np.testing.assert_array_equal(np.asarray(fs.data),
                                      np.asarray(fl.data))
        # depth 1: staged == the brute oracle, bit for bit
        fr = pt.render_film(cam, scene, samples=1, depth=1, seed=4,
                            backend="brute")
        assert np.asarray(fr.data).max() > 0
        np.testing.assert_array_equal(np.asarray(f1.data),
                                      np.asarray(fr.data))
    finally:
        beam_kernel._launch.clear_cache()


def test_accel_cache_not_fooled_by_sum_preserving_edit():
    """Round-4 advisor finding: the accel cache keyed on float SUMS of
    the scene arrays, so a sum-preserving material swap could silently
    render stale materials.  The key is now a hash of the raw bytes."""
    import jax.numpy as jnp

    cam, scene = pt.cornell_box(res=(32, 32))
    f1 = beam_kernel.render_film_beam(cam, scene, samples=48, depth=3,
                                      seed=3, interpret=True)
    alb = np.asarray(scene.albedo).copy()
    # swap the red and green walls: every array SUM is unchanged, the
    # image is not (indirect bounce color flips sides)
    red = np.nonzero(alb[:, 0] > alb[:, 1] + 0.2)[0]
    green = np.nonzero(alb[:, 1] > alb[:, 0] + 0.2)[0]
    assert red.size and green.size
    alb[red] = np.asarray(scene.albedo)[green[: red.size]]
    alb[green[: red.size]] = np.asarray(scene.albedo)[red]
    scene2 = scene.replace_materials(albedo=jnp.asarray(alb))
    f2 = beam_kernel.render_film_beam(cam, scene2, samples=48, depth=3,
                                      seed=3, interpret=True)
    assert not np.array_equal(np.asarray(f1.data), np.asarray(f2.data))
