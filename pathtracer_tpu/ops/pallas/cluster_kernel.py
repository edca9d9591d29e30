"""Pallas cluster-traversal intersection: the large-scene TPU hot path.

The reference traverses a BVH with a private per-thread stack
(shader.h:153-193); a TPU lane cannot afford private control flow or
per-lane gathers, so this kernel re-architects traversal around what the
hardware is good at (see clusters.py for the data structure):

  * a TILE of rays (tile_rows x 128, VMEM-resident vregs) is the traversal
    unit, not a single ray;
  * cluster AABBs are tested densely on the VPU against the whole tile;
    a cluster's triangles are entered only when ``any(hit)`` — a scalar
    branch (the vector analog of SIMT ballot, at profitable granularity);
  * triangles are read with sequential SCALAR loads from VMEM (measured at
    VPU speed-of-light in the dense loop — there are no gathers anywhere);
  * clusters are visited FRONT-TO-BACK per tile (visit order precomputed
    per tile from the tile's mean ray origin), so the per-ray nearest-hit
    ``tmin < best_t`` cull turns far clusters into 12-op AABB rejections.

Ray coherence is what makes ``any(hit)`` selective, so the driver sorts
rays by (origin Morton cell, direction octant) before tiling — an XLA sort
that costs ~30 microseconds for 256k rays on one chip, recovered many
times over in skipped clusters.  Padding rays (tile remainder) aim +x from
beyond the scene bounds and hit nothing by construction.

Correctness does not depend on the heuristics: every triangle lives in
exactly one cluster, a ray misses a cluster's triangles only if it misses
the cluster AABB, and the unrolled inner loop may overrun a cluster's
range into the next cluster's rows — testing a real scene triangle early
never produces a false hit, and the final PACK_PAD rows are degenerate
(rejected by the |det| < EPS test, triangle.h:25-44 contract).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...clusters import ClusterSet
from ...linalg import EPS, FLOAT_INF

LANES = 128
DEFAULT_TILE_ROWS = 32      # rays per tile = tile_rows * 128
INNER_UNROLL = 8            # triangle-loop unroll (<= clusters.PACK_PAD)


def _recip(a):
    r = pl.reciprocal(a, approx=True)
    return r * (2.0 - a * r)  # one Newton step (~23-bit)


def _kernel(start_ref, count_ref, bounds_ref, order_ref, tris_ref, rays_ref,
            t_ref, s_ref, *, tile_rows: int, n_clusters: int):
    """One ray tile vs every (reachable) cluster.

    SMEM: start (C,), count (C,) i32; bounds (C*8,) flat f32; order (1, 1,
    C_pad) i32 (this tile's front-to-back cluster visit order,
    lane-padded; padding ranks are never visited).
    VMEM: tris (P, 9) f32 packed [v1, e1, e2]; rays (6, tile_rows, 128)
    f32 planes [ox, oy, oz, dx, dy, dz].
    Out:  t (tile_rows, 128) f32 nearest hit or FLOAT_INF;
          s (tile_rows, 128) i32 packed triangle row or -1.
    """
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    # Exact IEEE division: d == 0 must give inf for the slab test.
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    best_t0 = jnp.full((tile_rows, LANES), FLOAT_INF, jnp.float32)
    best_s0 = jnp.full((tile_rows, LANES), -1, jnp.int32)

    def visit(rank, carry):
        best_t, best_s = carry
        c = order_ref[0, 0, rank]

        # Slab test (aabb.h:20-29) of the whole tile vs this cluster's box.
        b0 = c << 3  # bounds are FLAT (C*8,): 2D (C, 8) SMEM windows
        #              are lane-padded 16x by Mosaic and overflow at
        #              ~30k clusters; flat 1D windows are not padded
        t1x = (bounds_ref[b0 + 0] - ox) * inv_dx
        t2x = (bounds_ref[b0 + 3] - ox) * inv_dx
        t1y = (bounds_ref[b0 + 1] - oy) * inv_dy
        t2y = (bounds_ref[b0 + 4] - oy) * inv_dy
        t1z = (bounds_ref[b0 + 2] - oz) * inv_dz
        t2z = (bounds_ref[b0 + 5] - oz) * inv_dz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        want = (tmax >= 0.0) & (tmin <= tmax) & (tmin < best_t)

        def enter(carry):
            best_t, best_s = carry
            s0 = start_ref[c]
            n = count_ref[c]
            steps = (n + INNER_UNROLL - 1) // INNER_UNROLL

            def tri_block(i, carry):
                best_t, best_s = carry
                base = s0 + i * INNER_UNROLL
                for j in range(INNER_UNROLL):
                    slot = base + j
                    v1x = tris_ref[slot, 0]
                    v1y = tris_ref[slot, 1]
                    v1z = tris_ref[slot, 2]
                    e1x = tris_ref[slot, 3]
                    e1y = tris_ref[slot, 4]
                    e1z = tris_ref[slot, 5]
                    e2x = tris_ref[slot, 6]
                    e2y = tris_ref[slot, 7]
                    e2z = tris_ref[slot, 8]
                    # Möller–Trumbore (triangle.h:25-44); u <= 1 is implied
                    # by v >= 0 & u + v <= 1.
                    hx = dy * e2z - dz * e2y
                    hy = dz * e2x - dx * e2z
                    hz = dx * e2y - dy * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    f = _recip(a)
                    sx, sy, sz = ox - v1x, oy - v1y, oz - v1z
                    u = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (dx * qx + dy * qy + dz * qz)
                    tt = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = ((jnp.abs(a) >= EPS) & (u >= 0.0)
                          & (v >= 0.0) & (u + v <= 1.0) & (tt > 0.0)
                          & (tt < best_t))
                    best_t = jnp.where(ok, tt, best_t)
                    best_s = jnp.where(ok, slot, best_s)
                return best_t, best_s

            return jax.lax.fori_loop(0, steps, tri_block, (best_t, best_s))

        return jax.lax.cond(jnp.any(want), enter, lambda cr: cr,
                            (best_t, best_s))

    best_t, best_s = jax.lax.fori_loop(0, n_clusters, visit,
                                       (best_t0, best_s0))
    t_ref[:] = best_t
    s_ref[:] = best_s


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "n_clusters", "interpret"),
)
def _launch(start, count, bounds, order, tris, rays, *, tile_rows: int,
            n_clusters: int, interpret: bool = False):
    n_rows = rays.shape[1]
    assert n_rows % tile_rows == 0, (n_rows, tile_rows)
    n_tiles = n_rows // tile_rows
    kern = functools.partial(_kernel, tile_rows=tile_rows,
                             n_clusters=n_clusters)
    # Mosaic requires a block's last two dims to be tile-aligned or equal
    # to the array's; order is (n_tiles, 1, C_pad) so the (1, 1, C_pad)
    # block's trailing dims match the array exactly.  The visit loop reads
    # only ranks < n_clusters, so column padding is never read.
    order_pad = order.shape[2]
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, order_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((6, tile_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(start, count, bounds, order, tris, rays)


# ---------------------------------------------------------------------------
# Ray-coherence sort + tiling driver
# ---------------------------------------------------------------------------

_MORTON_BITS = 6  # per axis -> 18-bit cell | 3-bit octant sort keys


def _spread3(x):
    """Interleave the low 6 bits of x with two zero bits each (Morton)."""
    x = (x | (x << 8)) & 0x0300F
    x = (x | (x << 4)) & 0x030C3
    x = (x | (x << 2)) & 0x09249
    return x


def _sort_keys(ray_o, ray_d, lb, rt):
    """Coherence keys: origin Morton cell (major) | direction octant."""
    span = jnp.maximum(rt - lb, 1e-6)
    q = jnp.clip(((ray_o - lb) / span) * (1 << _MORTON_BITS), 0.0,
                 (1 << _MORTON_BITS) - 1).astype(jnp.int32)
    morton = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
              | (_spread3(q[:, 2]) << 2))
    octant = ((ray_d[:, 0] > 0).astype(jnp.int32)
              | ((ray_d[:, 1] > 0).astype(jnp.int32) << 1)
              | ((ray_d[:, 2] > 0).astype(jnp.int32) << 2))
    return (morton << 3) | octant


# On-device scene ceiling for COMPOSITE JITTED PROGRAMS around this
# kernel: when the pallas call sits inside a larger compiled program
# (render.py's nested lax.while tile driver, or a whole jitted optimizer
# step), XLA keeps the (P, 9) triangle window in HBM and stages it
# through SCOPED vmem lane-padded to 128 — the 16MB scoped limit is
# crossed at ~30k triangles (measured 51.8MB at 105k).  Launched as its
# OWN program (eager dispatch; _launch is jitted standalone) the VMEM
# operand is a regular allocation against the 128MB budget and 100k+
# scenes run fine.  Since round 5 the differentiable path exploits this:
# diff.py UNROLLS the bounce chain (trace_rays(unroll=True)) so no scan
# wraps the call, and inverse.recover_materials drops to eager step
# dispatch above this ceiling (verified: 105k garden, 2.2 s per
# value+grad step, gradcheck 1.1e-2).  Bigger scenes RENDER through the
# beam megakernel (any size).  The guard below turns the tile driver's
# opaque Mosaic error into advice.
MAX_CLUSTER_TRIS_ON_DEVICE = 30_000


def intersect_clusters(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    cs: ClusterSet,
    *,
    tile_rows: int = DEFAULT_TILE_ROWS,
    sort_rays: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-hit intersection of a flat ray batch against the clusters.

    ray_o, ray_d: (R, 3).  Returns (t, tid) with the bvh.h:156-183
    contract: t = FLOAT_INF and tid = -1 on miss, original scene triangle
    ids otherwise.  Traceable/jittable; ``interpret`` runs the Pallas
    interpreter (CPU tests).
    """
    R = ray_o.shape[0]
    tile = tile_rows * LANES
    Rp = ((R + tile - 1) // tile) * tile
    lb, rt = cs.scene_bounds

    if Rp != R:
        # Padding rays start beyond the +x face pointing +x: they can
        # never enter any cluster box (tmax < 0 on the x slab).
        pad_o = jnp.broadcast_to(rt + jnp.asarray([1.0, 1.0, 1.0]),
                                 (Rp - R, 3))
        pad_d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                                 (Rp - R, 3))
        ray_o = jnp.concatenate([ray_o, pad_o], axis=0)
        ray_d = jnp.concatenate([ray_d, pad_d], axis=0)

    if sort_rays:
        keys = _sort_keys(ray_o, ray_d, lb, rt)
        perm = jnp.argsort(keys).astype(jnp.int32)
        ray_o = ray_o[perm]
        ray_d = ray_d[perm]

    n_tiles = Rp // tile
    # Front-to-back cluster visit order per tile (by center distance from
    # the tile's mean origin).
    tile_origin = ray_o.reshape(n_tiles, tile, 3).mean(axis=1)
    d2 = jnp.sum(
        (tile_origin[:, None, :] - cs.centers[None, :, :]) ** 2, axis=-1)
    order = jnp.argsort(d2, axis=1).astype(jnp.int32)
    # Lane-align the SMEM block width (padding columns are never read:
    # the kernel's visit loop runs exactly n_clusters ranks).
    c_pad = ((cs.num_clusters + LANES - 1) // LANES) * LANES
    if c_pad != cs.num_clusters:
        order = jnp.pad(order, ((0, 0), (0, c_pad - cs.num_clusters)))
    order = order[:, None, :]  # (n_tiles, 1, C_pad) for the SMEM block spec

    planes = jnp.concatenate([ray_o.T, ray_d.T], axis=0)  # (6, Rp)
    planes = planes.reshape(6, Rp // LANES, LANES)

    t, slot = _launch(cs.start, cs.count, cs.bounds.reshape(-1), order,
                      cs.tri_data, planes, tile_rows=tile_rows,
                      n_clusters=cs.num_clusters, interpret=interpret)
    t = t.reshape(Rp)
    slot = slot.reshape(Rp)
    tid = jnp.where(slot >= 0, cs.tid_map[jnp.maximum(slot, 0)], -1)

    if sort_rays:
        t = jnp.zeros_like(t).at[perm].set(t)
        tid = jnp.zeros_like(tid).at[perm].set(tid)
    return t[:R], tid[:R]
