import numpy as np
import jax.numpy as jnp

from pathtracer_tpu import rng as prng


def test_lcg_matches_reference_constants():
    # rng.h:6-17: state = (1664525 * state + 1013904223) mod 2^32, seed 1.
    r = prng.Lcg(1)
    expected = []
    s = 1
    for _ in range(5):
        s = (1664525 * s + 1013904223) % (1 << 32)
        expected.append(s)
    got = [r.next_u32() for _ in range(5)]
    assert got == expected


def test_lcg_rand01_range():
    r = prng.Lcg()
    us = [r.rand01() for _ in range(1000)]
    assert all(0.0 <= u < 1.0 for u in us)
    assert 0.4 < np.mean(us) < 0.6


def test_hash_rand01_uniformity():
    state = jnp.arange(1, 20001, dtype=jnp.uint32)
    state, u = prng.rand01(state)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.01
    # second draw decorrelated from first
    _, u2 = prng.rand01(state)
    corr = np.corrcoef(u, np.asarray(u2))[0, 1]
    assert abs(corr) < 0.05


def test_hash_matches_shader_algorithm():
    """Check one step against a direct numpy transcription of shader.h:81-90."""
    s = np.uint32(12345)
    s = s ^ np.uint32(2747636419)
    s = np.uint32(s * np.uint64(2654435769) % (1 << 32))
    s = s ^ (s >> np.uint32(16))
    s = np.uint32(s * np.uint64(2654435769) % (1 << 32))
    s = s ^ (s >> np.uint32(16))
    s = np.uint32(s * np.uint64(2654435769) % (1 << 32))
    got = np.asarray(prng.hash_u32(jnp.uint32(12345)))
    assert got == s


def test_sample_seed_streams_distinct():
    w = jnp.zeros((4, 4), jnp.int32) + jnp.arange(4)[None, :]
    h = jnp.zeros((4, 4), jnp.int32) + jnp.arange(4)[:, None]
    s0 = np.asarray(prng.sample_seed(w, h, 4, 0))
    s1 = np.asarray(prng.sample_seed(w, h, 4, 1))
    assert len(np.unique(s0)) == 16          # all pixels distinct
    assert not np.any(s0 == s1)              # samples decorrelated
