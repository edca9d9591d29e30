"""Pallas megakernel vs the XLA reference path, in interpreter mode on CPU.

The kernel implements the identical math and RNG streams, so images must
match the jnp backend almost bit-for-bit (tiny differences only from
transcendental implementations / float reassociation)."""

import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.ops.pallas import trace_kernel


def _pallas_film(cam, scene, spp, depth, seed=1):
    return trace_kernel.render_film_pallas(
        cam, scene, spp, depth, seed=seed, tile_rows=8, interpret=True)


def test_pallas_matches_jnp_corner():
    cam, scene = pt.corner_scene(res=(16, 16))
    ref = pt.render_film(cam, scene, samples=4, depth=3, backend="brute")
    got = _pallas_film(cam, scene, 4, 3)
    np.testing.assert_allclose(np.asarray(got.data), np.asarray(ref.data),
                               atol=2e-4)


def test_pallas_matches_jnp_cornell():
    cam, scene = pt.cornell_box(res=(16, 16))
    ref = pt.render_film(cam, scene, samples=2, depth=4, backend="brute")
    got = _pallas_film(cam, scene, 2, 4)
    np.testing.assert_allclose(np.asarray(got.data), np.asarray(ref.data),
                               atol=2e-4)


def test_pallas_specular_scene():
    cam, scene = pt.modified_cornell(0.3, res=(16, 16))
    assert scene.has_specular
    ref = pt.render_film(cam, scene, samples=2, depth=3, backend="brute")
    got = _pallas_film(cam, scene, 2, 3)
    np.testing.assert_allclose(np.asarray(got.data), np.asarray(ref.data),
                               atol=2e-4)


def test_pallas_multi_call_accumulation():
    """spp split across kernel launches must equal a single launch."""
    cam, scene = pt.corner_scene(res=(16, 16))
    one = trace_kernel.render_film_pallas(
        cam, scene, 4, 3, seed=1, tile_rows=8, interpret=True)
    split = trace_kernel.render_film_pallas(
        cam, scene, 4, 3, seed=1, tile_rows=8, spp_per_call=1,
        interpret=True)
    np.testing.assert_allclose(np.asarray(one.data), np.asarray(split.data),
                               atol=1e-6)
