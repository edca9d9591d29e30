"""Inverse rendering: recover known materials from a rendered target."""

import jax.numpy as jnp
import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu import diff, inverse


def test_transforms_roundtrip():
    _, scene = pt.corner_scene(res=(4, 4))
    mats = diff.material_params(scene)
    back = inverse.to_materials(inverse.to_unconstrained(mats))
    np.testing.assert_allclose(np.asarray(back["emit"]),
                               np.asarray(mats["emit"]), atol=1e-4)
    # albedo clipped into (0,1) open interval before logit
    np.testing.assert_allclose(np.asarray(back["albedo"]),
                               np.clip(np.asarray(mats["albedo"]),
                                       1e-5, 1 - 1e-5), atol=1e-4)


def test_recover_albedo_corner():
    """Known emission, grey albedo start: recover the corner scene's
    white/green albedos from a 16x16 target.  (Joint albedo+emission from a
    single view is ambiguous — spurious emission explains brightness — so
    the albedo-only recovery is the well-posed benchmark; the emitter's
    brightness is recovered in test_recover_emission.)"""
    cam, scene = pt.corner_scene(res=(16, 16))
    true_mats = diff.material_params(scene)
    target = diff.render_film_diff(
        cam, scene, true_mats, samples=64, depth=3, sample_offset=500_000)

    params0 = inverse.init_params(scene)
    params0["emit"] = inverse.to_unconstrained(true_mats)["emit"]
    mats, losses = inverse.recover_materials(
        cam, scene, jnp.asarray(target), steps=80, samples=8, depth=3,
        lr=8e-2, params0=params0, optimize=("albedo",))
    # starting emission is already correct, so the initial loss is small;
    # the albedo fit still has to reduce it meaningfully
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])

    got = np.asarray(mats["albedo"])[: scene.num_tris]
    true = np.asarray(scene.albedo)[: scene.num_tris]
    # tri 1 is green (0,1,0): its green channel must dominate
    assert got[1, 1] > got[1, 0] + 0.2
    # dominant channels roughly recovered for the two diffuse tris
    assert np.abs(got[:2] - np.clip(true[:2], 0.02, 0.98)).mean() < 0.3


def test_recover_emission():
    """Known albedo, recover the emitter color/brightness."""
    cam, scene = pt.corner_scene(res=(16, 16))
    true_mats = diff.material_params(scene)
    target = diff.render_film_diff(
        cam, scene, true_mats, samples=64, depth=3, sample_offset=500_000)

    params0 = inverse.init_params(scene)
    params0["albedo"] = inverse.to_unconstrained(true_mats)["albedo"]
    mats, losses = inverse.recover_materials(
        cam, scene, jnp.asarray(target), steps=60, samples=8, depth=3,
        lr=8e-2, params0=params0, optimize=("emit",))
    got = np.asarray(mats["emit"])[2]  # the emitter triangle
    np.testing.assert_allclose(got, [1, 1, 1], atol=0.15)
