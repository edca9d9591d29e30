"""Scalar-scheduled coherent-beam path-tracing megakernel (large scenes).

The reference's large-scene capability is per-thread BVH traversal
(bvh.h:156-183 on the CPU; shader.h:153-193 per SIMT thread).  A TPU lane
cannot diverge, so any lane-parallel traversal pays the UNION of the work
its 1024-4096 co-resident rays need; measurement on the 9.8k-triangle
benchmark scene shows that union is 100-600x a single ray's need once
bounce directions decorrelate.  Two architectural moves close that gap:

1. **Coherent beam sampling** (Sadeghi et al. 2009, "Coherent Path
   Tracing"): all rays of a tile share ONE hemisphere-sample uniform pair
   per (sample, bounce); each ray keeps its own normal-flip, so a bounce
   produces exactly two beam directions (+u / -u) per tile.  Every pixel
   still receives ``spp`` independent, unbiased samples — only the
   CROSS-PIXEL correlation changes (structured tile noise instead of
   per-pixel grain at equal spp; converges to the identical image).
   Measured on the benchmark scene this collapses the per-tile traversal
   union by 15-20x.

2. **Scalar-core scheduling.** Mosaic predicates `lax.cond` (both branches
   always execute) and every vector->scalar round trip costs ~1.3 us, so
   per-cluster any()-gating is worthless on TPU.  Instead each
   (tile, bounce) runs a two-engine pipeline with a FIXED, small number of
   vector->scalar crossings:

     [VPU]    per-ray slab sweep of the supercluster AABBs; the per-box
              'any ray wants it' reductions stay in vector land (sublane
              max + an 8-box lane reduction on the MXU) and land as a
              (16,128) bit-plane  --DMA-->  SMEM;
     [scalar] orders the passing superclusters front-to-back (per-octant
              precomputed orders);
     [VPU]    per-ray slab sweep of those superclusters' cluster AABBs,
              bits written at POSITIONAL (queue-order) slots — the
              cluster count is therefore unbounded: when the queued
              clusters exceed one 2048-slot plane the sweep/walk/engine
              trio simply runs again on the next CHUNK (scene size is
              limited by VMEM triangle storage, not the bit-plane);
     [scalar] walks the bits in order, emitting a run-list of cluster ids
              into SMEM scratch;
     [VPU]    consumes the runs: dense 8-wide Moller-Trumbore blocks with
              per-ray nearest-hit + fused (mat_id, normal) selects.

   Every sweep test is per-ray exact; there is no conservative frustum
   anywhere, so specular bounces and the camera cone need no special
   cases.  Later chunks are slab-culled against the best_t the earlier
   chunks' engine already established (ordered-traversal early-out, paid
   per chunk instead of per ray).

Film layout: pixels are traced in Morton order within fixed 64x64
SQUARES (one 4096-pixel tile = one square), the squares rastered
row-major.  ANY resolution is supported: the film pads up to the next
64-multiple in each dimension (<= 6% waste at VGA sizes, none at
powers of two) and the host crops after de-interleaving.  Everything
else (RNG discipline for camera jitter, bounce math, material packing)
matches ops/pallas/trace_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import materials as mat
from ...camera import Camera
from ...image import Film
from ...linalg import EPS, FLOAT_INF, SHIFT_BIAS
from ...scene import Scene
from ...clusters import BeamAccel, build_beam_accel

LANES = 128
BLOCK = 8                     # triangles per unrolled block
DEFAULT_TILE_ROWS = 16        # rays per tile = tile_rows * 128 (swept
                              # round 4: 16 beats 32 by ~3-5% and wins
                              # bigger under chip contention; union 292
                              # vs 532 tests/seg at ctris=8)
BITROWS = 16                  # bit-plane sublanes: capacity BITROWS*128
CHUNK_CAP = BITROWS * LANES   # positional slots per cluster chunk (2048)
MAX_BEAM_SC = 1008            # supercluster ids live below the header
                              # slots (lanes 0-63 of the bit-plane);
                              # lifted from 126 in round 4 so ~100k-tri
                              # scenes keep a fine first-level cut

_SQ = 64                      # Morton square side; one square = one tile
_SQ_PIX = _SQ * _SQ           # 4096

# --- staged traversal (round 5): large scenes only ---------------------
# At 100k tris the whole cluster queue fits one 2048-slot chunk, so the
# ordered-traversal early-out never engaged: every queued cluster was
# swept, walked and run against best_t = INF (measured union 2430
# tests/segment at 105k tris vs 282 at 9.8k — near-LINEAR growth, round-4
# verdict item 1).  Staged mode restores the log-like behavior of per-ray
# ordered traversal (bvh.h:156-183) at beam granularity:
#   * the queue is consumed in SMALL positional chunks (STAGED_CHUNK0
#     positions, doubling each chunk) so the engine's best_t feeds back
#     into every later chunk's sweeps;
#   * before each chunk, the next STAGED_WINDOW queued superclusters are
#     re-tested against the CURRENT best_t on the VPU (one extra
#     vector->scalar plane per window, amortized across chunks — stale
#     bits are a conservative superset since best_t only shrinks), and
#     dead superclusters contribute ZERO chunk positions: no cluster
#     sweep, no walk slots;
#   * the cluster bit-plane gains a per-8-slot group-summary plane so the
#     serial scalar walk skips dead groups at ~1 load each.
STAGED_MIN_CL = 3000          # clusters; below this the legacy single
                              # -chunk pipeline is faster (fixed per-chunk
                              # overhead ~ 2 DMA drains + window sweep)
STAGED_WINDOW = 64            # superclusters re-swept per window
STAGED_CHUNK0 = 128           # first-chunk position budget (doubles
                              # per chunk up to CHUNK_CAP); {128, 64}
                              # won the round-5 hardware sweep
                              # (scratch/staged_tune2.py; spreads are
                              # ±4% chip noise, direction consistent)

# The supercluster bit-plane places bit of sc id b at (b % 16, b // 16):
# ids < 1016 occupy lanes 0-63, far from the header lanes at 126/127
# (slot capacity check against the header ids is below, after they are
# defined; the 8-aligned sc sweep may touch ids up to MAX_BEAM_SC+7).

# diagnostic knobs (scratch/beam_sweep2.py): statically disable stages
DEBUG_SKIP_RUNS = False     # skip the triangle run engine
DEBUG_SKIP_SWEEPS = False   # bit-planes forced to zero (no slab compute)
DEBUG_SKIP_QUEUE = False    # skip the scalar supercluster-queue walk

_GOLDEN = np.uint32(0x9E3779B9)
_INV_U24 = np.float32(1.0 / 16777216.0)

# header slots inside the (16,128) supercluster bit-plane handed to the
# scalar core (sc bits live at lanes 0-63; headers sit at the top lanes)
_HDR_OCT = 2047    # dominant direction octant (as float 0..7)
_HDR_ALIVE = 2031  # alive-ray count
assert ((MAX_BEAM_SC + 7) // 8) * 8 <= _HDR_ALIVE, \
    "8-aligned supercluster sweep would overwrite the header slots"


def _hash(s):
    s = s ^ np.uint32(2747636419)
    s = s * np.uint32(2654435769)
    s = s ^ (s >> 16)
    s = s * np.uint32(2654435769)
    s = s ^ (s >> 16)
    s = s * np.uint32(2654435769)
    return s


def _rand01(s):
    s = _hash(s)
    u = (s >> 8).astype(jnp.int32).astype(jnp.float32)
    return s, u * _INV_U24


def _deinterleave_bits(v):
    """Extract even bits of a uint32 vector (Morton decode, 16-bit out)."""
    v = v & np.uint32(0x55555555)
    v = (v | (v >> 1)) & np.uint32(0x33333333)
    v = (v | (v >> 2)) & np.uint32(0x0F0F0F0F)
    v = (v | (v >> 4)) & np.uint32(0x00FF00FF)
    v = (v | (v >> 8)) & np.uint32(0x0000FFFF)
    return v


def _kernel(iparams_ref, cam_ref, scb_ref, scf_ref, scn_ref, sco_ref,
            mats_ref, clb_ref, tris_ref, film_ref,
            xfer_vmem, xfer_smem, runs_ref, squeue_ref, best_ref, sem,
            sum_vmem, sum_smem, alive_vmem, alive_smem, cqueue_ref, sem2,
            *, tile_rows: int, depth: int, spp: int, n_sc: int, n_cl: int,
            n_mats: int, ctris: int, has_specular: bool, spec_tries: int,
            mats_inline: bool, staged: bool, count_runs: bool,
            interpret: bool):
    """One Morton film tile, full path pipeline.  SMEM inputs:

    iparams: (8,) i32 [s0, seed_mix, res_y (ACTUAL image height, for the
                       GPU seed convention), nsq_x (padded-film squares
                       per row), tile_px_log2, tile0, pad, pad]
             tile0 = global index of this launch's first tile (0 for a
             full-film render).  A band launch of tiles [tile0, tile0 +
             n_tiles) produces those tiles BIT-IDENTICAL to a full-film
             launch — the sharded driver's pixel-tile partitioning.
    cam: (16,) f32 (trace_kernel._camera_params layout)
    scb: (S*8,) f32 FLAT supercluster AABB rows [lb, rt, pad2] (2D (N,8)
        SMEM windows are lane-padded 16x by Mosaic; flat 1D is not);
        scf/scn: (S,) i32; sco: (8, S) i32
    mats: (M, 8) f32 packed materials (ignored when mats_inline)
    clb: (C*8,) f32 flat cluster AABB rows — SMEM while C <= CLB_SMEM_MAX,
        else VMEM
    VMEM: tris (P, 16) f32 [v1, e1, e2, mat_id|pack, N, color(3)|pad3]
    out:  film (3, tile_rows, 128) f32 radiance sums
    scratch: xfer VMEM/SMEM (16, 128) f32, runs/squeue i32 lists,
        best-hit VMEM accumulators (5 channels, +3 inline-color), DMA sem
    """
    s0 = iparams_ref[0]
    seed_mix = iparams_ref[1].astype(jnp.uint32)
    res_y = iparams_ref[2]
    nsq_x = iparams_ref[3]
    tpx_log2 = iparams_ref[4]  # log2(pixels per tile)

    tile = pl.program_id(0) + iparams_ref[5]
    shape = (tile_rows, LANES)
    lin = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    pix = (tile << tpx_log2) + lin
    # 64x64 Morton squares rastered row-major over the padded film; a
    # tile (<= 4096 px, power-of-two) never straddles a square, so the
    # square index is scalar per tile.
    sq = tile >> (12 - tpx_log2)
    sq_row = sq // nsq_x
    sq_col = sq - sq_row * nsq_x
    in_sq = pix.astype(jnp.uint32) & np.uint32(_SQ_PIX - 1)
    w = sq_col * _SQ + _deinterleave_bits(in_sq).astype(jnp.int32)
    h = sq_row * _SQ + _deinterleave_bits(in_sq >> 1).astype(jnp.int32)

    pix_seed = (h.astype(jnp.uint32)
                + w.astype(jnp.uint32) * res_y.astype(jnp.uint32)
                + np.uint32(1))
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    px, py, pz = cam_ref[0], cam_ref[1], cam_ref[2]
    rx, ry, rz = cam_ref[3], cam_ref[4], cam_ref[5]
    ux_, uy_, uz_ = cam_ref[6], cam_ref[7], cam_ref[8]
    fx, fy, fz = cam_ref[9], cam_ref[10], cam_ref[11]
    cell, hvx, hvy = cam_ref[12], cam_ref[13], cam_ref[14]
    pix_off = cam_ref[15]

    row16 = jax.lax.broadcasted_iota(jnp.int32, (BITROWS, LANES), 0)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (BITROWS, LANES), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    nbest = 8 if mats_inline else 5

    def to_smem(acc):
        """Hand a (16,128) bit-plane to the scalar core (the ONE
        vector->scalar crossing per use; ~1 us, so used per chunk, never
        per cluster)."""
        xfer_vmem[:, :] = acc
        if interpret:
            xfer_smem[:, :] = xfer_vmem[:, :]
        else:
            dma = pltpu.make_async_copy(xfer_vmem, xfer_smem, sem)
            dma.start()
            dma.wait()

    def one_sample(s, acc):
        acc_r, acc_g, acc_b = acc
        sidx = (s0 + s).astype(jnp.uint32)
        seed = _hash(pix_seed ^ (sidx * _GOLDEN))
        seed = _hash(seed ^ seed_mix)
        # tile-shared stream for bounce uniforms (whole-vreg, same value)
        tseed = _hash((jnp.full(shape, tile, jnp.int32).astype(jnp.uint32)
                       + np.uint32(0x9E377)) ^ (sidx * _GOLDEN))
        tseed = _hash(tseed ^ seed_mix)

        seed, u1 = _rand01(seed)
        seed, u2 = _rand01(seed)
        x = (wf + pix_off + u1) * cell - hvx
        y = (hf + pix_off + u2) * cell - hvy
        dx = x * rx + y * ux_ + fx
        dy = x * ry + y * uy_ + fy
        dz = x * rz + y * uz_ + fz
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv, dy * inv, dz * inv

        zeros = jnp.zeros(shape, jnp.float32)
        ones = jnp.ones(shape, jnp.float32)
        ox, oy, oz = zeros + px, zeros + py, zeros + pz
        thr_r = thr_g = thr_b = ones
        rad_r = rad_g = rad_b = zeros
        alive = jnp.ones(shape, jnp.bool_)
        # shared bounce-direction sample of the NEXT bounce (vreg-uniform)
        sdx = sdy = sdz = zeros

        for bounce in range(depth):
            inv_dx = 1.0 / dx
            inv_dy = 1.0 / dy
            inv_dz = 1.0 / dz

            def slab_rowmask(bref, idx, best_t):
                """Per-ray slab test of box ``idx`` against the whole
                tile, reduced over sublanes only: returns a (1, 128)
                row-mask (the cross-lane 'any' is done 8 boxes at a time
                by a tiny MXU dot so nothing ever crosses to the scalar
                core inside the sweep).  ``bref`` is a FLAT (N*8,) f32
                array of [lb, rt, pad2] rows: 2D (N, 8) SMEM arrays are
                lane-padded 16x by Mosaic, flat 1D arrays are not."""
                b0 = idx << 3
                lbx, lby, lbz = bref[b0], bref[b0 + 1], bref[b0 + 2]
                rtx, rty, rtz = bref[b0 + 3], bref[b0 + 4], bref[b0 + 5]
                t1x = (lbx - ox) * inv_dx
                t2x = (rtx - ox) * inv_dx
                t1y = (lby - oy) * inv_dy
                t2y = (rty - oy) * inv_dy
                t1z = (lbz - oz) * inv_dz
                t2z = (rtz - oz) * inv_dz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                               jnp.maximum(t1y, t2y)),
                                   jnp.maximum(t1z, t2z))
                want = ((tmax >= 0.0) & (tmin <= tmax) & (tmin < best_t)
                        & alive)
                return jnp.max(want.astype(jnp.float32), axis=0,
                               keepdims=True)

            ones_col = jnp.ones((LANES, 1), jnp.float32)

            def sweep_group(bref, base, pg, best_t, acc):
                """Test boxes [base, base+8) and set bits for them at
                POSITIONS [8*pg, 8*pg+8) in ``acc`` (bit of position p
                lives at (p % 16, p // 16): position-group pg fills rows
                [8*(pg&1), 8*(pg&1)+8) of lane pg >> 1)."""
                rows = [slab_rowmask(bref, base + j, best_t)
                        for j in range(8)]
                buf = jnp.concatenate(rows, axis=0)          # (8, 128)
                counts = jax.lax.dot_general(
                    buf, ones_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (8, 1)
                counts16 = jnp.concatenate([counts, counts], axis=0)
                half = (pg & 1) * 8
                sel = ((lane16 == (pg >> 1)) & (row16 >= half)
                       & (row16 < half + 8))
                return jnp.where(sel, counts16, acc)

            def sweep_group2(bref, base, pg, best_t, carry):
                """sweep_group plus a per-group summary plane: the total
                want-count of positions [8*pg, 8*pg+8) lands at summary
                slot (pg % 8, pg // 8) so the scalar walks can skip dead
                groups at one SMEM load each (staged mode)."""
                acc, sacc = carry
                rows = [slab_rowmask(bref, base + j, best_t)
                        for j in range(8)]
                buf = jnp.concatenate(rows, axis=0)          # (8, 128)
                counts = jax.lax.dot_general(
                    buf, ones_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (8, 1)
                counts16 = jnp.concatenate([counts, counts], axis=0)
                half = (pg & 1) * 8
                sel = ((lane16 == (pg >> 1)) & (row16 >= half)
                       & (row16 < half + 8))
                acc = jnp.where(sel, counts16, acc)
                tot = jnp.sum(counts)
                ssel = (row8 == (pg & 7)) & (lane8 == (pg >> 3))
                sacc = jnp.where(ssel, tot, sacc)
                return acc, sacc

            def to_smem2(acc, sacc):
                """Hand the positional plane AND its group-summary plane
                to the scalar core: two DMAs started together, one
                drain's worth of latency."""
                xfer_vmem[:, :] = acc
                sum_vmem[:, :] = sacc
                if interpret:
                    xfer_smem[:, :] = xfer_vmem[:, :]
                    sum_smem[:, :] = sum_vmem[:, :]
                else:
                    d1 = pltpu.make_async_copy(xfer_vmem, xfer_smem, sem)
                    d2 = pltpu.make_async_copy(sum_vmem, sum_smem, sem2)
                    d1.start()
                    d2.start()
                    d1.wait()
                    d2.wait()

            # dominant direction octant for front-to-back ordering
            if bounce == 0:
                mdx = jnp.sum(dx, keepdims=True)[:1, :1]
                mdy = jnp.sum(dy, keepdims=True)[:1, :1]
                mdz = jnp.sum(dz, keepdims=True)[:1, :1]
            else:
                mdx, mdy, mdz = sdx[:1, :1], sdy[:1, :1], sdz[:1, :1]
            octant = ((mdx > 0).astype(jnp.float32)
                      + (mdy > 0).astype(jnp.float32) * 2.0
                      + (mdz > 0).astype(jnp.float32) * 4.0)
            n_alive = jnp.sum(alive.astype(jnp.float32), keepdims=True)[:1, :1]

            best_t0 = jnp.full(shape, FLOAT_INF, jnp.float32)

            # --- supercluster sweep -> bits + header -> scalar core ------
            acc = jnp.zeros((BITROWS, LANES), jnp.float32)
            sacc0 = jnp.zeros((8, LANES), jnp.float32)
            n_scg = (n_sc + 7) // 8
            if not DEBUG_SKIP_SWEEPS:
                if staged:
                    # summary plane alongside: the queue walk below skips
                    # dead 8-id groups at one SMEM load each (at 608
                    # garden superclusters the flat per-rank walk costs
                    # ~16 us/tile-bounce; grouped it is ~3 us)
                    acc, sacc0 = jax.lax.fori_loop(
                        0, n_scg,
                        lambda g, c: sweep_group2(scb_ref, g << 3, g,
                                                  best_t0, c),
                        (acc, sacc0))
                elif n_scg <= 16:   # small scene: unroll statically
                    for g in range(n_scg):
                        acc = sweep_group(scb_ref, jnp.int32(8 * g),
                                          jnp.int32(g), best_t0, acc)
                else:             # 100k-class: dynamic loop, same body
                    acc = jax.lax.fori_loop(
                        0, n_scg,
                        lambda g, a: sweep_group(scb_ref, g << 3, g,
                                                 best_t0, a), acc)
            if not (DEBUG_SKIP_SWEEPS and DEBUG_SKIP_QUEUE):
                hdr = ((row16 == (_HDR_OCT % 16))
                       & (lane16 == (_HDR_OCT // 16)))
                acc = jnp.where(hdr, octant, acc)
                hdr = ((row16 == (_HDR_ALIVE % 16))
                       & (lane16 == (_HDR_ALIVE // 16)))
                acc = jnp.where(hdr, n_alive, acc)
                if staged:
                    to_smem2(acc, sacc0)
                else:
                    to_smem(acc)

            # --- scalar: queue of passing superclusters ------------------
            # legacy: per-octant front-to-back rank order (small queues).
            # staged: ID-order grouped walk with summary skip — at 100k
            # -class scenes the union is HIT-dominated (every queued sc
            # holds some ray's nearest hit; measured: depth-1 coherent
            # camera rays already need ~1850 tests/seg), so visit order
            # buys ~nothing while the flat rank walk costs ~25 cy/rank.
            oct_i = xfer_smem[_HDR_OCT % 16, _HDR_OCT // 16].astype(jnp.int32)
            any_alive = xfer_smem[_HDR_ALIVE % 16, _HDR_ALIVE // 16] > 0.5

            if DEBUG_SKIP_QUEUE:
                nq = jnp.int32(0)
            elif staged:
                def sqg_body(g, nq):
                    tot = sum_smem[g & 7, g >> 3]
                    nv = jnp.minimum(n_sc - (g << 3), 8)
                    nvv = jnp.where(tot > 0.5, nv, 0)

                    def ib(j, nq2):
                        sc = (g << 3) + j
                        bit = xfer_smem[sc & 15, sc >> 4] > 0.5

                        @pl.when(bit)
                        def _():
                            squeue_ref[nq2] = sc

                        return nq2 + bit.astype(jnp.int32)

                    return jax.lax.fori_loop(0, nvv, ib, nq)

                nq = jax.lax.fori_loop(0, n_scg, sqg_body, jnp.int32(0))
            else:
                def sq_body(rank, nq):
                    sc = sco_ref[oct_i, rank]
                    bit = xfer_smem[sc & 15, sc >> 4] > 0.5

                    @pl.when(bit)
                    def _():
                        squeue_ref[nq] = sc

                    return nq + bit.astype(jnp.int32)

                nq = jax.lax.fori_loop(0, n_sc, sq_body, jnp.int32(0))
            nq = jnp.where(any_alive, nq, 0)
            squeue_ref[nq] = jnp.int32(0)  # sentinel: pre-scan may peek

            # The run engine accumulates hit state in VMEM scratch refs
            # instead of fori carries: 5-8 quantities x 4 vregs of carry
            # would pressure the register allocator into spilling inside
            # the hot loop, and ref round-trips per 8-tri block are cheap.
            blk = min(BLOCK, ctris)   # tris per engine block (static)
            bpc = ctris // blk        # blocks per cluster (static)
            best_ref[0] = best_t0
            best_ref[1] = jnp.full(shape, -1.0, jnp.float32)
            for i in range(2, nbest):
                best_ref[i] = zeros

            def run_blocks(pi, _):
                # TWO 8-tri blocks per iteration: halves loop + ref
                # round-trip overhead and interleaves independent
                # dependency chains for VPU ILP.  Odd block counts are
                # padded by the builder's degenerate sentinel cluster.
                bases = []
                for half in range(2):
                    bi = pi * 2 + half
                    c = runs_ref[bi // bpc]
                    bases.append(c * ctris + (bi % bpc) * blk)
                st = [best_ref[i] for i in range(nbest)]
                for base in bases:
                    for j in range(blk):
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
                        hx = dy * e2z - dz * e2y
                        hy = dz * e2x - dx * e2z
                        hz = dx * e2y - dy * e2x
                        a = e1x * hx + e1y * hy + e1z * hz
                        rr = pl.reciprocal(a, approx=True)
                        f = rr * (2.0 - a * rr)
                        sx = ox - v1x
                        sy = oy - v1y
                        sz = oz - v1z
                        u = f * (sx * hx + sy * hy + sz * hz)
                        qx = sy * e1z - sz * e1y
                        qy = sz * e1x - sx * e1z
                        qz = sx * e1y - sy * e1x
                        v = f * (dx * qx + dy * qy + dz * qz)
                        tt = f * (e2x * qx + e2y * qy + e2z * qz)
                        ok = ((jnp.abs(a) >= EPS) & (u >= 0.0)
                              & (v >= 0.0) & (u + v <= 1.0)
                              & (tt > 0.0) & (tt < st[0]))
                        st[0] = jnp.where(ok, tt, st[0])
                        st[1] = jnp.where(ok, tris_ref[slot, 9], st[1])
                        st[2] = jnp.where(ok, tris_ref[slot, 10], st[2])
                        st[3] = jnp.where(ok, tris_ref[slot, 11], st[3])
                        st[4] = jnp.where(ok, tris_ref[slot, 12], st[4])
                        if mats_inline:
                            st[5] = jnp.where(ok, tris_ref[slot, 13], st[5])
                            st[6] = jnp.where(ok, tris_ref[slot, 14], st[6])
                            st[7] = jnp.where(ok, tris_ref[slot, 15], st[7])
                for i in range(nbest):
                    best_ref[i] = st[i]
                return 0

            def exec_runs(n_runs):
                if not DEBUG_SKIP_RUNS:
                    runs_ref[n_runs] = jnp.int32(n_cl)  # sentinel pad
                    jax.lax.fori_loop(0, (n_runs * bpc + 1) // 2,
                                      run_blocks, 0)

            # ---- positional chunked cluster sweep / walk / engine -------
            # Clusters are swept and walked in QUEUE-POSITIONAL bit slots
            # (8-aligned per supercluster), so cluster COUNT is unbounded:
            # when queued clusters exceed one 2048-slot plane, the trio
            # runs again on the next chunk, slab-culled by the best_t the
            # previous chunks' engine established (ordered early-out).
            def align8(x):
                return (x + 7) & jnp.int32(-8)

            def chunk_cond(st):
                qs, nruns = st
                return qs < nq

            def chunk_body(st):
                qs, nruns = st
                best_t = best_ref[0]

                # scalar pre-scan: queued sc's [qs, qe) fit this chunk.
                # The (qe == qs) clause guarantees progress; it can only
                # engage if a single supercluster exceeded CHUNK_CAP
                # positions, which the builder forbids (MAX_SC_CLUSTERS
                # in clusters.py), so no bit is ever dropped.
                def pcond(p):
                    qe, base = p
                    fits = (base + align8(scn_ref[squeue_ref[qe]])
                            <= CHUNK_CAP)
                    return (qe < nq) & ((qe == qs) | fits)

                def pbody(p):
                    qe, base = p
                    return qe + 1, base + align8(scn_ref[squeue_ref[qe]])

                qe, _ = jax.lax.while_loop(
                    pcond, pbody, (qs, jnp.int32(0)))

                # vector: positional sweep of queued sc's [qs, qe)
                def sweep_sc(qi, carry):
                    acc, pbase = carry
                    sc = squeue_ref[qi]
                    first = scf_ref[sc]
                    ngr = (scn_ref[sc] + 7) >> 3

                    def grp(k, acc2):
                        return sweep_group(clb_ref, first + (k << 3),
                                           (pbase >> 3) + k, best_t, acc2)

                    acc = jax.lax.fori_loop(0, ngr, grp, acc)
                    return acc, pbase + (ngr << 3)

                if DEBUG_SKIP_SWEEPS:
                    acc2 = jnp.zeros((BITROWS, LANES), jnp.float32)
                else:
                    acc2, _ = jax.lax.fori_loop(
                        qs, qe, sweep_sc,
                        (jnp.zeros((BITROWS, LANES), jnp.float32),
                         jnp.int32(0)))
                to_smem(acc2)

                # scalar: walk positions in queue order, emit cluster ids
                def wcond(wst):
                    qi, ci, n, p = wst
                    return qi < qe

                def wbody(wst):
                    qi, ci, n, p = wst
                    sc = squeue_ref[qi]
                    c = scf_ref[sc] + ci
                    bit = xfer_smem[p & 15, p >> 4] > 0.5

                    @pl.when(bit)
                    def _():
                        runs_ref[n] = c

                    n = n + bit.astype(jnp.int32)
                    ci = ci + 1
                    p = p + 1
                    nxt = ci >= scn_ref[sc]
                    return (jnp.where(nxt, qi + 1, qi),
                            jnp.where(nxt, 0, ci), n,
                            jnp.where(nxt, align8(p), p))

                _, _, n_runs, _ = jax.lax.while_loop(
                    wcond, wbody,
                    (qs, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
                exec_runs(n_runs)
                if count_runs:
                    nruns = nruns + n_runs.astype(jnp.float32)
                return qe, nruns

            # ---- staged traversal (large scenes; see module constants) --
            def staged_cond(st):
                return st[0] < nq

            def staged_body(st):
                qs, win_lo, win_hi, cidx, nruns = st
                best_t = best_ref[0]

                # (a) supercluster-alive window re-sweep against the
                # CURRENT best_t.  Amortized: stale bits are a
                # conservative superset (best_t only shrinks), so a
                # window is reused until consumed.  n_win = 0 when fresh
                # -> the fori is a real skip (scalar trip count).
                need = qs >= win_hi
                n_win = jnp.where(
                    need, jnp.minimum(nq - qs, STAGED_WINDOW), 0)

                def wsweep(j, acc):
                    sc = squeue_ref[qs + j]
                    rm = slab_rowmask(scb_ref, sc, best_t)
                    v = jnp.max(rm)
                    sel = (row8 == (j & 7)) & (lane8 == (j >> 3))
                    return jnp.where(sel, v, acc)

                aacc = jax.lax.fori_loop(
                    0, n_win, wsweep, jnp.zeros((8, LANES), jnp.float32))

                @pl.when(need)
                def _():
                    alive_vmem[:, :] = aacc
                    if interpret:
                        alive_smem[:, :] = alive_vmem[:, :]
                    else:
                        dma = pltpu.make_async_copy(
                            alive_vmem, alive_smem, sem2)
                        dma.start()
                        dma.wait()

                win_lo = jnp.where(need, qs, win_lo)
                win_hi = jnp.where(need, qs + n_win, win_hi)

                # (b) scalar pre-scan: the chunk is the ALIVE sc's among
                # queue entries [qs, qe) whose positions fit this chunk's
                # budget (doubling per chunk: early chunks small so the
                # engine's best_t feeds back fast, late chunks big so
                # fixed costs amortize).  Dead sc's consume nothing; the
                # compacted alive list lands in cqueue.
                limit = jnp.minimum(
                    jnp.int32(CHUNK_CAP),
                    jnp.int32(STAGED_CHUNK0) << jnp.minimum(cidx, 3))

                def a_bit(qi):
                    j = qi - win_lo
                    return alive_smem[j & 7, j >> 3] > 0.5

                def pcond(p):
                    qi, base, ncq = p
                    sz = jnp.where(a_bit(qi),
                                   align8(scn_ref[squeue_ref[qi]]), 0)
                    return (qi < win_hi) & ((qi == qs)
                                            | (base + sz <= limit))

                def pbody(p):
                    qi, base, ncq = p
                    sc = squeue_ref[qi]
                    alive = a_bit(qi)

                    @pl.when(alive)
                    def _():
                        cqueue_ref[ncq] = sc

                    sz = jnp.where(alive, align8(scn_ref[sc]), 0)
                    return qi + 1, base + sz, ncq + alive.astype(jnp.int32)

                qe, _, ncq = jax.lax.while_loop(
                    pcond, pbody, (qs, jnp.int32(0), jnp.int32(0)))

                # (c) vector: positional cluster sweep over the compact
                # list + the group-summary plane
                def sweep_ci(i, carry):
                    pair, pbase = carry
                    sc = cqueue_ref[i]
                    first = scf_ref[sc]
                    ngr = (scn_ref[sc] + 7) >> 3

                    def grp(k, c2):
                        return sweep_group2(clb_ref, first + (k << 3),
                                            (pbase >> 3) + k, best_t, c2)

                    pair = jax.lax.fori_loop(0, ngr, grp, pair)
                    return pair, pbase + (ngr << 3)

                z16 = jnp.zeros((BITROWS, LANES), jnp.float32)
                z8 = jnp.zeros((8, LANES), jnp.float32)
                if DEBUG_SKIP_SWEEPS:
                    acc2, sacc2 = z16, z8
                else:
                    (acc2, sacc2), _ = jax.lax.fori_loop(
                        0, ncq, sweep_ci, ((z16, z8), jnp.int32(0)))
                # both planes cross together: two DMAs, one drain
                to_smem2(acc2, sacc2)

                # (d) scalar walk, one GROUP of 8 positions per
                # iteration; a dead group costs ~1 summary load.  The
                # inner fori bound nv skips the 8-aligned tail slots
                # whose bits may be spuriously set by the sweep's
                # past-the-end boxes (same contract as the legacy walk).
                def wcond2(w):
                    return w[0] < ncq

                def wbody2(w):
                    i, gi, p, n = w
                    sc = cqueue_ref[i]
                    scn = scn_ref[sc]
                    pg = p >> 3
                    tot = sum_smem[pg & 7, pg >> 3]
                    nv = jnp.minimum(scn - (gi << 3), 8)
                    nvv = jnp.where(tot > 0.5, nv, 0)
                    base_c = scf_ref[sc] + (gi << 3)

                    def ib(jj, n2):
                        q = p + jj
                        bit = xfer_smem[q & 15, q >> 4] > 0.5

                        @pl.when(bit)
                        def _():
                            runs_ref[n2] = base_c + jj

                        return n2 + bit.astype(jnp.int32)

                    n = jax.lax.fori_loop(0, nvv, ib, n)
                    ng = (scn + 7) >> 3
                    last = gi + 1 >= ng
                    return (jnp.where(last, i + 1, i),
                            jnp.where(last, 0, gi + 1), p + 8, n)

                _, _, _, n_runs = jax.lax.while_loop(
                    wcond2, wbody2,
                    (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                     jnp.int32(0)))
                exec_runs(n_runs)
                if count_runs:
                    nruns = nruns + n_runs.astype(jnp.float32)
                return qe, win_lo, win_hi, cidx + 1, nruns

            if staged:
                _, _, _, _, nruns_total = jax.lax.while_loop(
                    staged_cond, staged_body,
                    (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                     jnp.int32(0), jnp.zeros((1, 1), jnp.float32)))
            else:
                _, nruns_total = jax.lax.while_loop(
                    chunk_cond, chunk_body,
                    (jnp.int32(0), jnp.zeros((1, 1), jnp.float32)))

            best_t = best_ref[0]
            f_mat = best_ref[1]
            f_nx = best_ref[2]
            f_ny = best_ref[3]
            f_nz = best_ref[4]

            # ---- shading (trace_kernel one_bounce math) -----------------
            if mats_inline:
                col_r = best_ref[5]
                col_g = best_ref[6]
                col_b = best_ref[7]
                flags = jnp.floor(f_mat * 0.125)
                rough = f_mat - 8.0 * flags
            else:
                col_r = zeros
                col_g = zeros
                col_b = zeros
                rough = zeros
                flags = zeros
                for m in range(n_mats):
                    is_m = f_mat == jnp.float32(m)
                    col_r = jnp.where(is_m, mats_ref[m, 0], col_r)
                    col_g = jnp.where(is_m, mats_ref[m, 1], col_g)
                    col_b = jnp.where(is_m, mats_ref[m, 2], col_b)
                    rough = jnp.where(is_m, mats_ref[m, 3], rough)
                    flags = jnp.where(is_m, mats_ref[m, 4], flags)

            inv_n = jax.lax.rsqrt(jnp.maximum(
                f_nx * f_nx + f_ny * f_ny + f_nz * f_nz, 1e-30))
            nx = f_nx * inv_n
            ny = f_ny * inv_n
            nz = f_nz * inv_n

            is_emit = flags > 1.5
            emitf = is_emit.astype(jnp.float32)
            albf = 1.0 - emitf
            hit = (best_t < FLOAT_INF) & alive
            hitf = hit.astype(jnp.float32)
            if not count_runs:
                rad_r = rad_r + hitf * thr_r * col_r * emitf
            rad_g = rad_g + hitf * thr_g * col_g * emitf
            rad_b = rad_b + hitf * thr_b * col_b * emitf

            cont = hit & ~is_emit
            if count_runs:
                # instrumented launch: channel 0 carries ONLY the emitted
                # run counts (the emission add above is skipped, so the
                # counter is exact, not counter + mean red radiance)
                rad_r = rad_r + nruns_total  # per-pixel: sum over bounces

            ndotd = nx * dx + ny * dy + nz * dz
            flip = jnp.where(ndotd < 0.0, 1.0, -1.0)
            nx, ny, nz = nx * flip, ny * flip, nz * flip

            # ---- shared bounce direction (coherent sampling) ------------
            tseed, tu1 = _rand01(tseed)
            tseed, tu2 = _rand01(tseed)
            xx = 2.0 * tu1 - 1.0
            ct = jnp.sqrt(jnp.maximum(1.0 - xx * xx, 0.0))
            phi = np.float32(2.0 * np.pi) * tu2
            sdx = ct * jnp.cos(phi)
            sdy = ct * jnp.sin(phi)
            sdz = -xx
            sflip = jnp.where(sdx * nx + sdy * ny + sdz * nz < 0.0,
                              -1.0, 1.0)
            ndx, ndy, ndz = sdx * sflip, sdy * sflip, sdz * sflip

            if has_specular:
                ddn = 2.0 * (dx * nx + dy * ny + dz * nz)
                mx = dx - ddn * nx
                my = dy - ddn * ny
                mz = dz - ddn * nz
                cands = []
                for _ in range(spec_tries):
                    tseed, c1 = _rand01(tseed)
                    tseed, c2 = _rand01(tseed)
                    tseed, c3 = _rand01(tseed)
                    cands.append((c1, c2, c3))
                cx, cy, cz = mx, my, mz
                for c1, c2, c3 in reversed(cands):
                    jx = mx + (c1 - 0.5) * rough
                    jy = my + (c2 - 0.5) * rough
                    jz = mz + (c3 - 0.5) * rough
                    okc = (jx * nx + jy * ny + jz * nz) >= 0.0
                    cx = jnp.where(okc, jx, cx)
                    cy = jnp.where(okc, jy, cy)
                    cz = jnp.where(okc, jz, cz)
                invs = jax.lax.rsqrt(cx * cx + cy * cy + cz * cz)
                spec = (flags > 0.5) & ~is_emit
                ndx = jnp.where(spec, cx * invs, ndx)
                ndy = jnp.where(spec, cy * invs, ndy)
                ndz = jnp.where(spec, cz * invs, ndz)

            cos = nx * ndx + ny * ndy + nz * ndz
            w2c = 2.0 * cos
            thr_r = thr_r * jnp.where(cont, w2c * col_r * albf, 1.0)
            thr_g = thr_g * jnp.where(cont, w2c * col_g * albf, 1.0)
            thr_b = thr_b * jnp.where(cont, w2c * col_b * albf, 1.0)

            hx_ = ox + dx * best_t
            hy_ = oy + dy * best_t
            hz_ = oz + dz * best_t
            bias = np.float32(SHIFT_BIAS)
            ox = jnp.where(cont, hx_ + nx * bias, ox)
            oy = jnp.where(cont, hy_ + ny * bias, oy)
            oz = jnp.where(cont, hz_ + nz * bias, oz)
            dx = jnp.where(cont, ndx, dx)
            dy = jnp.where(cont, ndy, dy)
            dz = jnp.where(cont, ndz, dz)
            alive = cont

        return acc_r + rad_r, acc_g + rad_g, acc_b + rad_b

    zeros = jnp.zeros(shape, jnp.float32)
    acc_r, acc_g, acc_b = jax.lax.fori_loop(
        0, spp, one_sample, (zeros, zeros, zeros))
    film_ref[0] = acc_r
    film_ref[1] = acc_g
    film_ref[2] = acc_b


# Cluster AABBs live in SMEM (fast scalar loads in the sweep) while they
# fit the ~1MB budget alongside the planes/run lists; gigantic scenes
# spill them to VMEM (broadcast loads cost vector issue slots: measured
# ~-6% on the 9.8k-tri bench when always-VMEM).  Bounds are passed FLAT
# (N*8,) — Mosaic lane-pads 2D (N, 8) SMEM windows 16x.
CLB_SMEM_MAX = 20000  # clusters (640KB flat)


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "depth", "spp", "n_sc", "n_cl", "n_mats",
                     "ctris", "has_specular", "n_tiles", "mats_inline",
                     "staged", "count_runs", "interpret"),
)
def _launch(iparams, cam_params, accel_arrays, *, tile_rows, depth, spp,
            n_sc, n_cl, n_mats, ctris, has_specular, n_tiles,
            mats_inline=False, staged=False, count_runs=False,
            interpret=False):
    (scb, scf, scn, sco, mats, clb, tris) = accel_arrays
    kern = functools.partial(
        _kernel, tile_rows=tile_rows, depth=depth, spp=spp, n_sc=n_sc,
        n_cl=n_cl, n_mats=n_mats, ctris=ctris, has_specular=has_specular,
        spec_tries=mat.SPECULAR_TRIES, mats_inline=mats_inline,
        staged=staged, count_runs=count_runs, interpret=interpret)
    n_rows = n_tiles * tile_rows
    nbest = 8 if mats_inline else 5
    clb_smem = n_cl <= CLB_SMEM_MAX
    clb_space = pltpu.SMEM if clb_smem else pltpu.VMEM
    scb = scb.reshape(-1)           # flat: no 16x SMEM lane padding
    clb = clb.reshape(-1)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # iparams
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sc_bounds
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sc_first
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sc_ncl
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sc_order
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mats
            pl.BlockSpec(memory_space=clb_space),    # cl_bounds
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
        ],
        out_specs=pl.BlockSpec((3, tile_rows, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BITROWS, LANES), jnp.float32),
            pltpu.SMEM((BITROWS, LANES), jnp.float32),
            pltpu.SMEM((CHUNK_CAP + 2,), jnp.int32),
            pltpu.SMEM((MAX_BEAM_SC + 2,), jnp.int32),
            pltpu.VMEM((nbest, tile_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            # staged-traversal scratch (a few KB; allocated in both modes
            # to keep the kernel signature stable)
            pltpu.VMEM((8, LANES), jnp.float32),   # group-summary plane
            pltpu.SMEM((8, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.float32),   # sc-alive window bits
            pltpu.SMEM((8, LANES), jnp.float32),
            pltpu.SMEM((CHUNK_CAP // 8 + 2,), jnp.int32),  # cqueue
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(iparams, cam_params, scb, scf, scn, sco, mats, clb, tris)


_ACCEL_CACHE = []  # [(fingerprint, accel)]


def _scene_fingerprint(scene: Scene):
    """Content key: two equal scenes built twice share one accel (an id()
    key would rebuild and pin dead scenes' device arrays).  Hashes the RAW
    BYTES of every geometry/material array — float sums are permutation
    -invariant and quantize at ~unit resolution for 100k-tri scenes, so a
    sum key could serve a stale accel after a sum-preserving scene edit
    (round-4 advisor finding)."""
    import hashlib
    h = hashlib.sha1()
    for arr in (*scene.host_verts(), *scene.host_materials()):
        a = np.ascontiguousarray(arr)
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return (scene.num_tris, h.hexdigest())


def _accel_for(scene: Scene) -> BeamAccel:
    """Small per-scene accel cache: the host-side build (SAH cut + row
    packing) costs ~1 s at 10k tris and must not be paid per render call."""
    key = _scene_fingerprint(scene)
    for k, a in _ACCEL_CACHE:
        if k == key:
            return a
    a = build_beam_accel(scene)
    _ACCEL_CACHE.append((key, a))
    del _ACCEL_CACHE[:-4]
    return a


def _padded_res(width: int, height: int) -> Tuple[int, int]:
    """Film dims padded up to the 64x64 Morton-square grid."""
    return (-(-width // _SQ) * _SQ, -(-height // _SQ) * _SQ)


def _sq_to_raster(wp: int, hp: int) -> np.ndarray:
    """raster_index[device_index] for the padded wp x hp film: device
    order is Morton within each 64x64 square, squares row-major."""
    idx = np.arange(wp * hp, dtype=np.uint64)
    nsq_x = wp // _SQ
    sq = idx // _SQ_PIX
    in_sq = idx % _SQ_PIX

    def deint(v):
        v = v & 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        return v

    w = (sq % nsq_x) * _SQ + deint(in_sq)
    h = (sq // nsq_x) * _SQ + deint(in_sq >> 1)
    return (h * wp + w).astype(np.int64)


def render_sum_beam(camera: Camera, scene: Scene, sample0: int,
                    samples: int, depth: int = 5, *, seed: int = 1,
                    accel: Optional[BeamAccel] = None,
                    tile_rows: int = DEFAULT_TILE_ROWS,
                    spp_per_call: Optional[int] = None,
                    staged: Optional[bool] = None,
                    count_runs: bool = False,
                    interpret: bool = False,
                    verbose: bool = False) -> np.ndarray:
    """Radiance SUM over samples [sample0, sample0+samples) as an
    (H, W, 3) float32 numpy array.  Because each (pixel, sample) pair
    owns an independent RNG stream, sample windows compose exactly:
    summing two adjacent windows equals one combined render — the
    property block-boundary checkpointing (render.py) relies on.

    Any resolution is supported (the film pads to the 64x64 Morton
    square grid on device and crops here)."""
    width, height = camera.res
    wp, hp = _padded_res(width, height)
    n_pix = wp * hp
    tile_rows = min(tile_rows, _SQ_PIX // LANES)
    while _SQ_PIX % (tile_rows * LANES):
        tile_rows //= 2
        if tile_rows == 0:
            raise ValueError(f"untileable tile_rows for {width}x{height}")
    n_tiles = n_pix // (tile_rows * LANES)
    tpx_log2 = (tile_rows * LANES).bit_length() - 1

    if accel is None:
        accel = _accel_for(scene)
    if accel.num_superclusters > MAX_BEAM_SC:
        raise ValueError(
            f"{accel.num_superclusters} superclusters > {MAX_BEAM_SC}; "
            f"rebuild with larger sc_tris")
    from ...ops.pallas import trace_kernel as tk
    cam_params = jnp.asarray(tk._camera_params(camera))
    mix = (int(seed) * 0x85EBCA6B) & 0xFFFFFFFF
    seed_mix = mix - (1 << 32) if mix >= (1 << 31) else mix
    accel_arrays = (accel.sc_bounds, accel.sc_first, accel.sc_ncl,
                    accel.sc_order, accel.mats, accel.cl_bounds,
                    accel.tri_cols)

    if spp_per_call is None:
        spp_per_call = max(1, min(samples, (1 << 25) // (n_pix * depth)))
    if staged is None:
        staged = accel.num_clusters >= STAGED_MIN_CL

    film_m = jnp.zeros((3, n_pix // LANES, LANES), jnp.float32)
    s = 0
    while s < samples:
        spp = min(spp_per_call, samples - s)
        iparams = jnp.array(
            [sample0 + s, seed_mix, height, wp // _SQ, tpx_log2, 0, 0, 0],
            jnp.int32)
        film_m = film_m + _launch(
            iparams, cam_params, accel_arrays, tile_rows=tile_rows,
            depth=depth, spp=spp, n_sc=accel.num_superclusters,
            n_cl=accel.num_clusters, n_mats=accel.num_materials,
            ctris=accel.ctris, has_specular=scene.has_specular,
            n_tiles=n_tiles, mats_inline=accel.mats_inline,
            staged=staged, count_runs=count_runs, interpret=interpret)
        s += spp
        if verbose:
            print(f"\rRendered: {sample0 + s} spp.", end="", flush=True)
    if verbose:
        print()
    flat = np.asarray(film_m).reshape(3, n_pix)
    img = np.zeros((n_pix, 3), np.float32)
    img[_sq_to_raster(wp, hp)] = flat.T
    return img.reshape(hp, wp, 3)[:height, :width]


def render_film_beam(camera: Camera, scene: Scene, samples: int,
                     depth: int = 5, *, seed: int = 1,
                     accel: Optional[BeamAccel] = None,
                     tile_rows: int = DEFAULT_TILE_ROWS,
                     spp_per_call: Optional[int] = None,
                     staged: Optional[bool] = None,
                     count_runs: bool = False,
                     interpret: bool = False,
                     verbose: bool = False) -> Film:
    """Render the sample-averaged linear film with the coherent-beam
    megakernel.  Unbiased per pixel at any spp; noise is tile-correlated
    (see module docstring) — use backend='cluster' for the reference's
    per-pixel-independent sampling discipline.

    ``count_runs=True`` is the instrumented launch: film channel 0 is
    REPLACED by the per-sample emitted-run count summed over bounces
    (channels 1-2 still carry radiance); see count_tri_tests."""
    film = render_sum_beam(
        camera, scene, 0, samples, depth, seed=seed, accel=accel,
        tile_rows=tile_rows, spp_per_call=spp_per_call, staged=staged,
        count_runs=count_runs, interpret=interpret, verbose=verbose)
    return Film(camera.res, data=film / np.float32(samples))


def count_tri_tests(camera: Camera, scene: Scene, samples: int = 8,
                    depth: int = 5, *, accel: Optional[BeamAccel] = None,
                    tile_rows: int = DEFAULT_TILE_ROWS,
                    staged: Optional[bool] = None,
                    interpret: bool = False) -> float:
    """Mean triangle tests per ray segment — the traversal-union metric
    the roofline analysis is built on (ROOFLINE.md §3).  Runs the
    instrumented launch (count_runs=True): film channel 0 carries the
    per-sample sum over bounces of emitted 8-tri runs, exactly (the
    radiance-contamination bug of the old global-flag instrumentation is
    gone), so mean / depth * ctris = tests per segment."""
    if accel is None:
        accel = _accel_for(scene)
    film = render_film_beam(camera, scene, samples, depth, accel=accel,
                            tile_rows=tile_rows, staged=staged,
                            count_runs=True, interpret=interpret)
    return float(np.asarray(film.data)[..., 0].mean()) / depth * accel.ctris
