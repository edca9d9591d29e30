"""Checkpoint/resume tests."""

import os

import jax.numpy as jnp
import numpy as np
import optax

import pathtracer_tpu as pt
from pathtracer_tpu import diff, inverse
from pathtracer_tpu.utils import checkpoint as ckpt


def test_render_checkpoint_roundtrip(tmp_path, rng_np):
    film = rng_np.random((8, 8, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "r.npz")
    ckpt.save_render_checkpoint(path, film, 123, {"spp": 512, "depth": 5})
    f2, done, meta = ckpt.load_render_checkpoint(path)
    np.testing.assert_array_equal(film, f2)
    assert done == 123 and meta["spp"] == 512


def test_train_checkpoint_roundtrip(tmp_path):
    _, scene = pt.corner_scene(res=(8, 8))
    params = inverse.init_params(scene)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    path = os.path.join(tmp_path, "t.npz")
    ckpt.save_train_checkpoint(path, params, opt_state, 7, {"lr": 1e-2})
    p2, o2, step, meta = ckpt.load_train_checkpoint(path, params, opt_state)
    assert step == 7 and meta["lr"] == 1e-2
    np.testing.assert_array_equal(np.asarray(params["albedo"]),
                                  np.asarray(p2["albedo"]))
    # optimizer state trees match leaf-for-leaf
    import jax
    l1 = jax.tree_util.tree_leaves(opt_state)
    l2 = jax.tree_util.tree_leaves(o2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resumed_render_matches_uninterrupted():
    """film_sum checkpointing + independent per-sample streams => resuming
    at sample k gives the identical final film."""
    cam, scene = pt.corner_scene(res=(8, 8))
    params = diff.material_params(scene)
    full = diff.render_film_diff(cam, scene, params, samples=8, depth=3)
    part1 = diff.render_film_diff(cam, scene, params, samples=4, depth=3,
                                  sample_offset=0)
    part2 = diff.render_film_diff(cam, scene, params, samples=4, depth=3,
                                  sample_offset=4)
    resumed = (np.asarray(part1) * 4 + np.asarray(part2) * 4) / 8
    np.testing.assert_allclose(np.asarray(full), resumed, atol=1e-6)
