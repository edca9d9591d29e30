import numpy as np
import jax.numpy as jnp

from pathtracer_tpu import materials as mat
from pathtracer_tpu import rng as prng


def test_hemisphere_sample_unit_and_correct_side(rng_np):
    n = rng_np.normal(size=(500, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    u = rng_np.uniform(size=500).astype(np.float32)
    v = rng_np.uniform(size=500).astype(np.float32)
    s = np.asarray(mat.hemisphere_sample(jnp.asarray(u), jnp.asarray(v),
                                         jnp.asarray(n)))
    np.testing.assert_allclose(np.linalg.norm(s, axis=-1), 1.0, atol=1e-5)
    assert np.all(np.sum(s * n, -1) >= 0.0)


def test_hemisphere_sample_formula_matches_reference():
    """material.h:6-14: theta = acos(2u-1) - pi/2, phi = 2*pi*v."""
    u, v = 0.3, 0.7
    theta = np.arccos(2 * u - 1) - np.pi / 2
    phi = 2 * np.pi * v
    expected = np.array([np.cos(theta) * np.cos(phi),
                         np.cos(theta) * np.sin(phi), np.sin(theta)])
    n = jnp.asarray(expected[None])  # normal aligned with sample: no flip
    got = np.asarray(mat.hemisphere_sample(
        jnp.array([u], jnp.float32), jnp.array([v], jnp.float32), n))[0]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_specular_sample_zero_roughness_is_mirror(rng_np):
    d = rng_np.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = np.tile(np.array([0, 0, 1.0], np.float32), (64, 1))
    d[:, 2] = -np.abs(d[:, 2]) - 0.1  # ensure incoming
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    cube = jnp.zeros((mat.SPECULAR_TRIES, 64, 3)) + 0.5
    s = np.asarray(mat.specular_sample(
        jnp.asarray(d), jnp.asarray(n), jnp.zeros(64), cube))
    mirror = d - 2 * (d * n).sum(-1, keepdims=True) * n
    mirror /= np.linalg.norm(mirror, axis=-1, keepdims=True)
    np.testing.assert_allclose(s, mirror, atol=1e-5)


def test_specular_sample_above_surface(rng_np):
    d = np.array([[0.7, 0.0, -0.714]], np.float32).repeat(256, 0)
    n = np.array([[0.0, 0.0, 1.0]], np.float32).repeat(256, 0)
    state = jnp.arange(1, 257, dtype=jnp.uint32)
    state, flat = prng.randn01(state, 3 * mat.SPECULAR_TRIES)
    cube = jnp.moveaxis(
        flat.reshape(mat.SPECULAR_TRIES, 3, 256), 1, -1)
    s = np.asarray(mat.specular_sample(
        jnp.asarray(d), jnp.asarray(n), jnp.full(256, 0.8), cube))
    np.testing.assert_allclose(np.linalg.norm(s, axis=-1), 1.0, atol=1e-5)
    # jittered around the mirror direction, and (almost) all above surface
    assert (np.sum(s * n, -1) >= -1e-6).mean() > 0.99


def test_sample_direction_dispatch(rng_np):
    d = np.array([[0.0, 0.0, -1.0]], np.float32)
    n = np.array([[0.0, 0.0, 1.0]], np.float32)
    cube = jnp.zeros((mat.SPECULAR_TRIES, 1, 3)) + 0.5
    spec = np.asarray(mat.sample_direction(
        jnp.array([mat.SPECULAR]), jnp.zeros(1), jnp.asarray(d),
        jnp.asarray(n), jnp.array([0.2]), jnp.array([0.9]), cube))
    np.testing.assert_allclose(spec[0], [0, 0, 1], atol=1e-5)
    diff = np.asarray(mat.sample_direction(
        jnp.array([mat.DIFFUSE]), jnp.zeros(1), jnp.asarray(d),
        jnp.asarray(n), jnp.array([0.2]), jnp.array([0.9]), cube))
    assert diff[0] @ n[0] >= 0
