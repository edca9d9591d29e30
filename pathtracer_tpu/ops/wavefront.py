"""Wavefront path-tracing pipeline over SoA ray queues.

The reference's megakernel (one thread = one pixel's whole path,
shader.h:219-259) wastes lanes once paths die or diverge.  The wavefront
restructuring (BASELINE.json north star) splits each bounce into separate
stages over structure-of-arrays ray queues:

    ray-gen  ->  [ traverse/intersect  ->  shade/scatter  ->  compact ] * depth

with the film updated by scatter-add from shade results, and the queue
compacted between bounces so later stages run dense over surviving rays.

TPU-specific design notes (vs the CUDA wavefront in the literature):

  * Queues are fixed-capacity device arrays + a live count (XLA needs
    static shapes); "compaction" is a stable partition that moves live rays
    to the front (argsort of the dead flag — a race-free prefix-sum
    scatter, SURVEY.md section 5 race-detection analog: structural, no
    atomics).
  * Dead-lane work isn't eliminated (the arrays keep their static size) —
    the wins are (a) the BVH while_loop iterates only until the LIVE rays'
    stacks drain (dead rays park with empty stacks), and (b) bounce stages
    can be compiled per-bounce with the queue count driving early-exit via
    lax.cond at the host level when a whole bounce has no survivors.
  * Film accumulation uses segment-sum by pixel id (deterministic order,
    reassociable), not atomics.

For the small headline scenes the fused Pallas megakernel is faster (no
HBM queue traffic); this pipeline is the scalable path for OBJ-size scenes
traced with the BVH.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import materials as mat
from ..linalg import SHIFT_BIAS, dot
from ..scene import Scene
from . import intersect as isect
from .trace import (_ALBEDO, _EMIT, _IS_EMIT, _IS_SPEC, _NORMAL, _ROUGH,
                    gather_features, shade_table)


def raygen(camera, w, h, state):
    """Stage 1: camera rays for pixel coords (R,) with jitter from the
    per-ray streams. Returns (ray_o, ray_d, state)."""
    from .. import rng as prng
    from ..camera import get_rays

    state, u1 = prng.rand01(state)
    state, u2 = prng.rand01(state)
    ray_o, ray_d = get_rays(camera, w, h, u1, u2)
    return ray_o, ray_d, state


def bounce_stage(table, intersect_fn, queue, has_specular: bool):
    """One wavefront bounce: intersect + shade/scatter + continuation.

    queue: dict with ray_o, ray_d (R,3); thr (R,3); pix (R,) int32;
    state (R,) uint32; alive (R,) bool.
    Returns (radiance_contrib (R,3), new_queue).  The contribution is the
    per-ray ``throughput * emit`` of this bounce (zero for dead/missed).
    """
    ray_o, ray_d = queue["ray_o"], queue["ray_d"]
    t, tid = intersect_fn(ray_o, ray_d)
    hit = (tid >= 0) & queue["alive"]

    feat = gather_features(table, jnp.where(hit, tid, -1))
    albedo = feat[..., _ALBEDO]
    emit = feat[..., _EMIT]
    rough = feat[..., _ROUGH]
    n_geo = feat[..., _NORMAL]
    is_emit = feat[..., _IS_EMIT] > 0.5
    is_spec = feat[..., _IS_SPEC] > 0.5

    contrib = jnp.where(hit[..., None], queue["thr"] * emit, 0.0)
    cont = hit & ~is_emit

    n = jnp.where(dot(n_geo, ray_d)[..., None] < 0.0, n_geo, -n_geo)
    state, (u, v, cube) = mat.draw_bounce_uniforms(queue["state"],
                                                   has_specular)
    diff_d = mat.hemisphere_sample(u, v, n)
    if has_specular:
        spec_d = mat.specular_sample(ray_d, n, rough, cube)
        new_d = jnp.where(is_spec[..., None], spec_d, diff_d)
    else:
        new_d = diff_d

    cos = dot(n, new_d)
    contm = cont[..., None]
    thr = queue["thr"] * jnp.where(contm, 2.0 * albedo * cos[..., None], 1.0)
    hit_p = ray_o + ray_d * t[..., None]

    new_queue = {
        "ray_o": jnp.where(contm, hit_p + n * SHIFT_BIAS, ray_o),
        "ray_d": jnp.where(contm, new_d, ray_d),
        "thr": thr,
        "pix": queue["pix"],
        "state": state,
        "alive": cont,
    }
    return contrib, new_queue


def compact(queue):
    """Stable-partition live rays to the front (prefix-sum scatter, no
    atomics).  Dead rays keep their (inert) state at the back."""
    order = jnp.argsort(~queue["alive"], stable=True)
    return {k: v[order] for k, v in queue.items()}


def render_wavefront(
    camera,
    scene: Scene,
    samples: int,
    depth: int = 5,
    *,
    bvh=None,
    seed: int = 1,
    compact_every: int = 1,
):
    """Full wavefront render to a linear film (H, W, 3).

    One queue entry per (pixel, sample); contributions scatter-add into the
    flat film by pixel id via segment_sum.
    """
    from .. import rng as prng
    from ..bvh import build_bvh

    width, height = camera.res
    npix = width * height
    if bvh is None and scene.padded_size > 512:
        bvh = build_bvh(scene)

    if bvh is not None:
        max_leaf, stack_size = bvh.max_leaf, bvh.stack_size()

        def intersect_fn(o, d):
            return isect.intersect_bvh(o, d, bvh, scene.v1, scene.v2,
                                       scene.v3, max_leaf=max_leaf,
                                       stack_size=stack_size)
    else:
        def intersect_fn(o, d):
            return isect.intersect_brute(o, d, scene.v1, scene.v2, scene.v3)

    table = shade_table(scene)

    @jax.jit
    def one_sample_batch(sidx):
        pix = jnp.arange(npix, dtype=jnp.int32)
        w = pix % width
        h = pix // width
        state = prng.sample_seed(w, h, height, sidx, seed)
        ray_o, ray_d, state = raygen(camera, w, h, state)
        queue = {
            "ray_o": ray_o, "ray_d": ray_d,
            "thr": jnp.ones((npix, 3), jnp.float32),
            "pix": pix, "state": state,
            "alive": jnp.ones((npix,), bool),
        }
        film = jnp.zeros((npix, 3), jnp.float32)
        for d in range(depth):
            contrib, queue = bounce_stage(table, intersect_fn, queue,
                                          scene.has_specular)
            film = film + jax.ops.segment_sum(
                contrib, queue["pix"], num_segments=npix)
            if compact_every and (d + 1) % compact_every == 0 and d + 1 < depth:
                queue = compact(queue)
        return film

    film = jnp.zeros((npix, 3), jnp.float32)
    for s in range(samples):
        film = film + one_sample_batch(jnp.int32(s))
    film = film / jnp.float32(samples)
    return film.reshape(height, width, 3)
