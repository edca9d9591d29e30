"""Inverse rendering: recover material parameters from a target image.

BASELINE.json config 5: "recover albedo/emission/roughness of Cornell box
from target image via pixel-gradient descent".  The optimizer works in an
unconstrained parameter space and maps into physical ranges:

    albedo    = sigmoid(p)        in (0, 1)^3
    emission  = softplus(p)       in (0, inf)^3
    roughness = sigmoid(p)        in (0, 1)

Gradients come from the detached/reparameterized estimator in diff.py; each
step traces a fresh set of sample indices (the global index advances by
``samples`` per step) so successive steps see independent Monte-Carlo noise,
which with Adam behaves like SGD on the true expected loss.

Runs single-device here; the multi-chip variant is
``parallel.make_sharded_train_step`` (same math, grads psum over ICI).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import rng as prng
from .diff import render_film_diff
from .scene import Scene


def _softplus_inv(y):
    y = jnp.maximum(y, 1e-6)
    return y + jnp.log(-jnp.expm1(-y))


def _logit(y):
    y = jnp.clip(y, 1e-5, 1 - 1e-5)
    return jnp.log(y) - jnp.log1p(-y)


def to_unconstrained(mats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {
        "albedo": _logit(mats["albedo"]),
        "emit": _softplus_inv(mats["emit"]),
        "roughness": _logit(mats["roughness"]),
    }


def to_materials(params: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {
        "albedo": jax.nn.sigmoid(params["albedo"]),
        "emit": jax.nn.softplus(params["emit"]),
        "roughness": jax.nn.sigmoid(params["roughness"]),
    }


def init_params(scene: Scene, value: float = 0.5) -> Dict[str, jnp.ndarray]:
    """Uniform 'grey' starting point with the scene's array shapes."""
    T = scene.padded_size
    return {
        "albedo": jnp.zeros((T, 3)) + _logit(jnp.float32(value)),
        "emit": jnp.zeros((T, 3)) + _softplus_inv(jnp.float32(value)),
        "roughness": jnp.zeros((T,)) + _logit(jnp.float32(value)),
    }


def recover_materials(
    camera,
    scene: Scene,
    target: jnp.ndarray,
    *,
    steps: int = 200,
    samples: int = 8,
    depth: int = 5,
    lr: float = 5e-2,
    seed: int = prng.SEED,
    params0: Optional[Dict[str, jnp.ndarray]] = None,
    optimize: tuple = ("albedo", "emit", "roughness"),
    checkpoint: Optional[str] = None,
    checkpoint_every: int = 25,
    backend: str = "brute",
    verbose: bool = False,
):
    """Gradient-descend material parameters to match ``target`` (linear film).

    ``optimize`` selects which parameter groups move; the rest stay frozen
    at their initial values (useful to break the emission-vs-albedo
    ambiguity when only albedo is unknown).

    ``checkpoint``: path to a .npz resume file; if present, training
    resumes at the recorded step (params + Adam state restored — each step
    k draws the sample window k*samples, so the continued trajectory is
    the one the uninterrupted run would have taken); it is (re)written
    every ``checkpoint_every`` steps and at the end.

    Returns (materials, losses): the recovered physical material arrays and
    the per-step loss history (of the steps run in THIS call).
    """
    import os

    import optax

    from .diff import make_accel
    from .utils import checkpoint as ckpt

    accel = make_accel(scene, backend)
    opt = optax.adam(lr)
    params = params0 if params0 is not None else init_params(scene)
    opt_state = opt.init(params)
    frozen = {k: (0.0 if k in optimize else 1.0) for k in params}

    # Resuming with a different backend (or scene) would silently continue
    # with a different gradient estimator; record both and abort on
    # mismatch, like render_film's checkpoint meta validation.
    meta = {"samples": samples, "depth": depth, "seed": seed,
            "backend": backend,
            "scene_sum": float(scene.host_verts()[0].sum()
                               + scene.host_materials()[1].sum())}
    start_step = 0
    if checkpoint is not None:
        cpath = checkpoint if checkpoint.endswith(".npz") \
            else checkpoint + ".npz"
        if os.path.exists(cpath):
            params, opt_state, start_step, saved = ckpt.load_train_checkpoint(
                cpath, params, opt_state)
            if saved != meta:
                raise ValueError(
                    f"checkpoint {cpath} was written by a different "
                    f"training config:\n  saved: {saved}\n  this:  {meta}")
            if verbose:
                print(f"Resuming at step {start_step}/{steps}.")

    @jax.jit
    def step(params, opt_state, k):
        def loss_fn(p):
            film = render_film_diff(
                camera, scene, to_materials(p), samples, depth,
                seed=seed, sample_offset=k * samples,
                backend=backend, accel=accel)
            return jnp.mean((film - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        updates = {k: u * (1.0 - frozen[k]) for k, u in updates.items()}
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    for k in range(start_step, steps):
        params, opt_state, loss = step(params, opt_state, jnp.int32(k))
        losses.append(float(loss))
        if verbose and (k % 10 == 0 or k == steps - 1):
            print(f"step {k:4d}  loss {losses[-1]:.3e}")
        if checkpoint is not None and (
                (k + 1) % checkpoint_every == 0 or k == steps - 1):
            ckpt.save_train_checkpoint(
                checkpoint, params, opt_state, k + 1, meta)
    return to_materials(params), np.asarray(losses)
