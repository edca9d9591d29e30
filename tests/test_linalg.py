import numpy as np
import jax.numpy as jnp

from pathtracer_tpu import linalg as la


def test_dot_cross_batched(rng_np):
    a = rng_np.normal(size=(5, 7, 3)).astype(np.float32)
    b = rng_np.normal(size=(5, 7, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(la.dot(jnp.asarray(a), jnp.asarray(b))),
        np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(la.cross(jnp.asarray(a), jnp.asarray(b))),
        np.cross(a, b), rtol=1e-4, atol=1e-5)


def test_normalize_reflect(rng_np):
    v = rng_np.normal(size=(11, 3)).astype(np.float32)
    n = np.asarray(la.normalize(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)

    # reflect about +z flips z
    d = np.array([[0.3, 0.4, -0.5]], np.float32)
    nz = np.array([[0.0, 0.0, 1.0]], np.float32)
    r = np.asarray(la.reflect(jnp.asarray(d), jnp.asarray(nz)))
    np.testing.assert_allclose(r, [[0.3, 0.4, 0.5]], atol=1e-6)


def test_constants_match_reference():
    # linalg.h:10-12, render.h:16
    assert abs(la.DEG2RAD - np.pi / 180) < 1e-12
    assert la.EPS == 1e-6
    assert la.FLOAT_INF == 1e30
    assert la.SHIFT_BIAS == 1e-4


def test_mix():
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(la.mix(a, b, 0.25)),
                               [0.75, 0.25, 0.0], atol=1e-7)
