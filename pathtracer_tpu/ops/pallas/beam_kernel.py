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
     [VPU]    per-ray slab sweep of ONLY those superclusters' cluster
              AABBs (trip counts are scalar-computed: real branches, not
              predication) -> second bit-plane  --DMA-->  SMEM;
     [scalar] walks the bits in order, emitting a run-list of cluster ids
              into SMEM scratch;
     [VPU]    consumes the runs: dense 8-wide Moller-Trumbore blocks with
              per-ray nearest-hit + fused (mat_id, normal) selects.

   The walk is PHASED (PHASE_BUDGETS): the nearest clusters are
   intersected first, then the cluster sweep re-runs against the updated
   per-ray best_t, so occluded clusters are culled exactly like the
   ordered-stack early-out of per-ray traversal — but paid once per tile
   phase instead of per ray.  Every sweep test is per-ray exact; there is
   no conservative frustum anywhere, so specular bounces and the camera
   cone need no special cases.

Everything else (RNG discipline for camera jitter, bounce math, material
packing) matches ops/pallas/trace_kernel.py; pixels are laid out in Morton
order so a tile is a compact square screen patch (primary coherence) and
the film is de-interleaved once on the host.
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
DEFAULT_TILE_ROWS = 32        # rays per tile = tile_rows * 128
# Walk phases: measured on the 9.8k-tri benchmark, the phased t-cull
# re-sweep recovers less than it costs (ideal-t-cull union is only 28%
# below the no-cull union there, and a second sweep+DMA+walk eats that),
# so the production default is a single full phase.  The phased two-ended
# machinery stays for scenes with heavier occlusion: set e.g. (16, 1<<30).
PHASE_BUDGETS = (1 << 30,)
BITROWS = 16                  # bit-plane sublanes: capacity BITROWS*128
MAX_RUNS = 2000               # SMEM run-list capacity (clusters per phase)
MAX_BEAM_CLUSTERS = 2000      # bit-plane capacity minus header slots
MAX_BEAM_SC = 126

# Capacity coupling (fail loudly if one constant is raised without the
# others): the walk's n < MAX_RUNS guard silently DROPS clusters if the
# bit-plane can legally hold more ids than the run list, and the
# 8-aligned cluster sweep writes bits up to the next multiple of 8, which
# must stay below the header lanes at 2031/2047.
assert MAX_RUNS >= MAX_BEAM_CLUSTERS, \
    "run list must hold every cluster the bit-plane can mark"
assert ((MAX_BEAM_CLUSTERS + 7) // 8) * 8 <= 2031, \
    "8-aligned cluster sweep would overwrite the bit-plane header slots"
assert MAX_BEAM_SC <= 2031, "supercluster ids collide with header slots"

# diagnostic knobs (scratch/beam_sweep2.py): statically disable stages
DEBUG_SKIP_RUNS = False     # skip the triangle run engine
DEBUG_SKIP_SWEEPS = False   # bit-planes forced to zero (no slab compute)

_GOLDEN = np.uint32(0x9E3779B9)
_INV_U24 = np.float32(1.0 / 16777216.0)

# header slots inside the (16,128) bit-plane handed to the scalar core
# (bit of box id b lives at row b % 16, lane b // 16; ids stay < 2000)
_HDR_OCT = 2047    # dominant direction octant (as float 0..7)
_HDR_ALIVE = 2031  # alive-ray count


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
            clb_ref, mats_ref, tris_ref, film_ref,
            xfer_vmem, xfer_smem, runs_ref, squeue_ref, best_ref, sem, *,
            tile_rows: int, depth: int, spp: int, n_sc: int, n_cl: int,
            n_mats: int, ctris: int, has_specular: bool, spec_tries: int,
            count_runs: bool, interpret: bool):
    """One Morton film tile, full path pipeline.  SMEM inputs:

    iparams: (8,) i32 [s0, seed_mix, res_x_log2, res_y, tile_px_log2,
                       pad, pad, pad]
    cam: (16,) f32 (trace_kernel._camera_params layout)
    scb: (S, 8) f32 supercluster AABBs; scf/scn: (S,) i32; sco: (8, S) i32
    clb: (C, 8) f32 cluster AABBs
    mats: (M, 8) f32 packed materials
    VMEM: tris (P, 16) f32 [v1, e1, e2, mat_id, N, pad3]
    out:  film (3, tile_rows, 128) f32 radiance sums
    scratch: xfer VMEM/SMEM (16, 128) f32, runs/squeue i32 lists,
        best-hit VMEM accumulators, DMA sem
    """
    s0 = iparams_ref[0]
    seed_mix = iparams_ref[1].astype(jnp.uint32)
    resx_log2 = iparams_ref[2]
    res_y = iparams_ref[3]
    tpx_log2 = iparams_ref[4]  # log2(pixels per tile)

    tile = pl.program_id(0)
    shape = (tile_rows, LANES)
    lin = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    pix = (tile << tpx_log2) + lin
    # Morton -> (w, h).  For W != H the image is a stack of W x W Morton
    # squares: low 2*log2(W) bits interleave, high bits are extra rows.
    pu = pix.astype(jnp.uint32)
    sq_bits = (2 * resx_log2).astype(jnp.uint32)
    sq_mask = (jnp.uint32(1) << sq_bits) - np.uint32(1)
    in_sq = pu & sq_mask
    w = _deinterleave_bits(in_sq).astype(jnp.int32)
    h_sq = _deinterleave_bits(in_sq >> 1).astype(jnp.int32)
    h = h_sq + ((pu >> sq_bits).astype(jnp.int32) << resx_log2)

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

    def to_smem(acc):
        """Hand a (16,128) bit-plane to the scalar core (the ONE
        vector->scalar crossing per use; ~1 us, so used per phase, never
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
                core inside the sweep)."""
                lbx, lby, lbz = bref[idx, 0], bref[idx, 1], bref[idx, 2]
                rtx, rty, rtz = bref[idx, 3], bref[idx, 4], bref[idx, 5]
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

            def sweep_group(bref, g, best_t, acc):
                """Test boxes [8g, 8g+8) and set their bits in ``acc``
                (bit of box b lives at (b % 16, b // 16): group g fills
                rows [8*(g&1), 8*(g&1)+8) of lane g >> 1)."""
                rows = [slab_rowmask(bref, g * 8 + j, best_t)
                        for j in range(8)]
                buf = jnp.concatenate(rows, axis=0)          # (8, 128)
                counts = jax.lax.dot_general(
                    buf, ones_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (8, 1)
                counts16 = jnp.concatenate([counts, counts], axis=0)
                half = (g & 1) * 8
                sel = ((lane16 == (g >> 1)) & (row16 >= half)
                       & (row16 < half + 8))
                return jnp.where(sel, counts16, acc)

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

            best_t = jnp.full(shape, FLOAT_INF, jnp.float32)
            f_mat = jnp.full(shape, -1.0, jnp.float32)
            f_nx = zeros
            f_ny = zeros
            f_nz = zeros

            # --- supercluster sweep -> bits + header -> scalar core ------
            acc = jnp.zeros((BITROWS, LANES), jnp.float32)
            if not DEBUG_SKIP_SWEEPS:
                for g in range((n_sc + 7) // 8):   # static: S is small
                    acc = sweep_group(scb_ref, jnp.int32(g), best_t, acc)
            hdr = ((row16 == (_HDR_OCT % 16))
                   & (lane16 == (_HDR_OCT // 16)))
            acc = jnp.where(hdr, octant, acc)
            hdr = ((row16 == (_HDR_ALIVE % 16))
                   & (lane16 == (_HDR_ALIVE // 16)))
            acc = jnp.where(hdr, n_alive, acc)
            to_smem(acc)

            # --- scalar: ordered queue of passing superclusters ----------
            oct_i = xfer_smem[_HDR_OCT % 16, _HDR_OCT // 16].astype(jnp.int32)
            any_alive = xfer_smem[_HDR_ALIVE % 16, _HDR_ALIVE // 16] > 0.5

            def sq_body(rank, nq):
                sc = sco_ref[oct_i, rank]
                bit = xfer_smem[sc & 15, sc >> 4] > 0.5

                @pl.when(bit)
                def _():
                    squeue_ref[nq] = sc

                return nq + bit.astype(jnp.int32)

            nq = jax.lax.fori_loop(0, n_sc, sq_body, jnp.int32(0))
            nq = jnp.where(any_alive, nq, 0)

            def cl_sweep(q0, q_end, best_t):
                def sqb(i, acc):
                    sc = squeue_ref[i]
                    first = scf_ref[sc]
                    g0 = first >> 3
                    g1 = (first + scn_ref[sc] + 7) >> 3

                    def grp(g, acc):
                        # groups are 8-aligned; edge groups test a few
                        # neighbouring clusters too (idempotent: the walk
                        # only reads bits inside queued ranges, and the
                        # builder pads the bounds array with inverted
                        # never-hit boxes)
                        return sweep_group(clb_ref, g, best_t, acc)

                    return jax.lax.fori_loop(g0, g1, grp, acc)

                if DEBUG_SKIP_SWEEPS:
                    return jnp.zeros((BITROWS, LANES), jnp.float32)
                return jax.lax.fori_loop(
                    q0, q_end, sqb,
                    jnp.zeros((BITROWS, LANES), jnp.float32))

            def walk(q0, c0, budget, q_end):
                """Scalar: emit bit-set cluster ids (squeue positions
                [q0, q_end), forward) into runs_ref; returns
                (n_runs, qi, ci) cursor for resume."""
                def cond(st):
                    qi, ci, n, em = st
                    return (qi < q_end) & (em < budget) & (n < MAX_RUNS)

                def body(st):
                    qi, ci, n, em = st
                    sc = squeue_ref[qi]
                    c = scf_ref[sc] + ci
                    bit = xfer_smem[c & 15, c >> 4] > 0.5

                    @pl.when(bit)
                    def _():
                        runs_ref[n] = c

                    keep = bit.astype(jnp.int32)
                    ci = ci + 1
                    nxt = ci >= scn_ref[sc]
                    return (jnp.where(nxt, qi + 1, qi),
                            jnp.where(nxt, 0, ci), n + keep, em + keep)

                qi, ci, n, _ = jax.lax.while_loop(
                    cond, body, (q0, c0, jnp.int32(0), jnp.int32(0)))
                return n, qi, ci

            def walk_back(q0, budget, q_low):
                """Scalar: emit bit-set clusters of WHOLE superclusters
                from squeue position q0 DOWN to (exclusive) q_low — the
                squeue is front-to-back for the +u beam, so walking from
                the far end is front-to-back for the -u beam.  Returns
                (n_runs, qj) with qj = last unprocessed position."""
                def cond(st):
                    qj, n, em = st
                    return (qj > q_low) & (em < budget) & (n < MAX_RUNS)

                def body(st):
                    qj, n, em = st
                    sc = squeue_ref[qj]
                    first = scf_ref[sc]

                    def cl(i, st2):
                        n, em = st2
                        c = first + i
                        bit = xfer_smem[c & 15, c >> 4] > 0.5

                        @pl.when(bit)
                        def _():
                            runs_ref[n] = c

                        keep = bit.astype(jnp.int32)
                        return (n + keep, em + keep)

                    n, em = jax.lax.fori_loop(0, scn_ref[sc], cl, (n, em))
                    return (qj - 1, n, em)

                qj, n, _ = jax.lax.while_loop(
                    cond, body, (q0, jnp.int32(0), jnp.int32(0)))
                return n, qj

            # The run engine accumulates hit state in VMEM scratch refs
            # instead of fori carries: 5 quantities x 4 vregs of carry
            # would pressure the register allocator into spilling inside
            # the hot loop, and ref round-trips per 8-tri block are cheap.
            bpc = ctris // BLOCK  # blocks per cluster (static)
            best_ref[0] = best_t
            best_ref[1] = f_mat
            best_ref[2] = f_nx
            best_ref[3] = f_ny
            best_ref[4] = f_nz

            def run_blocks(pi, _):
                # TWO 8-tri blocks per iteration: halves loop + ref
                # round-trip overhead and interleaves independent
                # dependency chains for VPU ILP.  Odd block counts are
                # padded by the builder's degenerate sentinel cluster.
                bases = []
                for half in range(2):
                    bi = pi * 2 + half
                    c = runs_ref[bi // bpc]
                    bases.append(c * ctris + (bi % bpc) * BLOCK)
                best_t = best_ref[0]
                f_mat = best_ref[1]
                f_nx = best_ref[2]
                f_ny = best_ref[3]
                f_nz = best_ref[4]
                for base in bases:
                    for j in range(BLOCK):
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
                              & (tt > 0.0) & (tt < best_t))
                        best_t = jnp.where(ok, tt, best_t)
                        f_mat = jnp.where(ok, tris_ref[slot, 9], f_mat)
                        f_nx = jnp.where(ok, tris_ref[slot, 10], f_nx)
                        f_ny = jnp.where(ok, tris_ref[slot, 11], f_ny)
                        f_nz = jnp.where(ok, tris_ref[slot, 12], f_nz)
                best_ref[0] = best_t
                best_ref[1] = f_mat
                best_ref[2] = f_nx
                best_ref[3] = f_ny
                best_ref[4] = f_nz
                return 0

            def exec_runs(n_runs):
                if not DEBUG_SKIP_RUNS:
                    runs_ref[n_runs] = jnp.int32(n_cl)  # sentinel pad
                    jax.lax.fori_loop(0, (n_runs * bpc + 1) // 2,
                                      run_blocks, 0)

            # Phase 1 walks BOTH ends of the front-to-back queue: the
            # forward end is nearest for the +u half of the tile's rays,
            # the far end is nearest for the -u half (bounce 0 has one
            # beam, forward only).  Establishing early hits on both halves
            # is what makes the phase-2 re-sweep's per-ray t-cull bite.
            qi = jnp.int32(0)
            ci = jnp.int32(0)
            qj = nq - 1
            nruns_total = jnp.zeros((1, 1), jnp.float32)
            for phase, budget in enumerate(PHASE_BUDGETS):
                last = phase == len(PHASE_BUDGETS) - 1
                # later phases only re-sweep the clusters the walk has
                # not consumed yet (the updated best_t culls there)
                to_smem(cl_sweep(qi if phase else jnp.int32(0),
                                 (qj + 1) if phase else nq, best_t))
                n_runs, qi, ci = walk(qi, ci, jnp.int32(budget),
                                      qj + 1 if last else nq)
                if count_runs:
                    nruns_total = nruns_total + n_runs.astype(jnp.float32)
                exec_runs(n_runs)
                if bounce > 0 and not last:
                    n_back, qj = walk_back(qj, jnp.int32(budget), qi - 1)
                    if count_runs:
                        nruns_total = (nruns_total
                                       + n_back.astype(jnp.float32))
                    exec_runs(n_back)
                best_t = best_ref[0]
                f_mat = best_ref[1]
                f_nx = best_ref[2]
                f_ny = best_ref[3]
                f_nz = best_ref[4]

            # ---- shading (trace_kernel one_bounce math) -----------------
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


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "depth", "spp", "n_sc", "n_cl", "n_mats",
                     "ctris", "has_specular", "n_tiles", "count_runs",
                     "interpret"),
)
def _launch(iparams, cam_params, accel_arrays, *, tile_rows, depth, spp,
            n_sc, n_cl, n_mats, ctris, has_specular, n_tiles,
            count_runs=False, interpret=False):
    (scb, scf, scn, sco, clb, mats, tris) = accel_arrays
    kern = functools.partial(
        _kernel, tile_rows=tile_rows, depth=depth, spp=spp, n_sc=n_sc,
        n_cl=n_cl, n_mats=n_mats, ctris=ctris, has_specular=has_specular,
        spec_tries=mat.SPECULAR_TRIES, count_runs=count_runs,
        interpret=interpret)
    n_rows = n_tiles * tile_rows
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
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cl_bounds
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mats
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
        ],
        out_specs=pl.BlockSpec((3, tile_rows, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BITROWS, LANES), jnp.float32),
            pltpu.SMEM((BITROWS, LANES), jnp.float32),
            pltpu.SMEM((MAX_RUNS + 2,), jnp.int32),
            pltpu.SMEM((MAX_BEAM_SC + 2,), jnp.int32),
            pltpu.VMEM((5, tile_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(iparams, cam_params, scb, scf, scn, sco, clb, mats, tris)


_ACCEL_CACHE = []  # [(fingerprint, accel)]


def _scene_fingerprint(scene: Scene):
    """Cheap content key: two equal scenes built twice share one accel
    (an id() key would rebuild and pin dead scenes' device arrays)."""
    v1, v2, v3 = scene.host_verts()
    mtype, albedo, emit, rough = scene.host_materials()
    return (scene.num_tris, float(v1.sum()), float(v2.sum()),
            float(v3.sum()), float(albedo.sum()), float(emit.sum()),
            float(rough.sum()), int(mtype.sum()))


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


def _morton_to_raster(width: int, height: int) -> np.ndarray:
    """raster_index[morton_index] for a W x H image (W = 2^k; H a
    multiple of W; Morton squares stacked along y)."""
    idx = np.arange(width * height, dtype=np.uint64)
    sq = width * width
    in_sq = idx % sq
    sq_i = idx // sq

    def deint(v):
        v = v & 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        v = (v | (v >> 16)) & 0x00000000FFFFFFFF
        return v

    w = deint(in_sq)
    h = deint(in_sq >> 1) + sq_i * width
    return (h * width + w).astype(np.int64)


def render_film_beam(camera: Camera, scene: Scene, samples: int,
                     depth: int = 5, *, seed: int = 1,
                     accel: Optional[BeamAccel] = None,
                     tile_rows: int = DEFAULT_TILE_ROWS,
                     spp_per_call: Optional[int] = None,
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
    from ...ops.pallas import trace_kernel as tk

    width, height = camera.res
    if width & (width - 1):
        raise ValueError(f"beam backend needs power-of-two width, got {width}")
    if height % width:
        raise ValueError(
            f"beam backend needs height to be a multiple of width "
            f"(Morton squares), got {width}x{height}")
    n_pix = width * height
    while n_pix % (tile_rows * LANES):
        tile_rows //= 2
        if tile_rows == 0:
            raise ValueError(f"{width}x{height} not tileable")
    n_tiles = n_pix // (tile_rows * LANES)
    tpx_log2 = (tile_rows * LANES).bit_length() - 1

    if accel is None:
        accel = _accel_for(scene)
    if accel.num_clusters > MAX_BEAM_CLUSTERS:
        raise ValueError(
            f"scene has {accel.num_clusters} clusters "
            f"(> {MAX_BEAM_CLUSTERS} bit-plane capacity); rebuild the "
            f"accel with larger ctris or use backend='cluster'")
    if accel.num_superclusters > MAX_BEAM_SC:
        raise ValueError(
            f"{accel.num_superclusters} superclusters > {MAX_BEAM_SC}; "
            f"rebuild with larger sc_tris")
    cam_params = jnp.asarray(tk._camera_params(camera))
    mix = (int(seed) * 0x85EBCA6B) & 0xFFFFFFFF
    seed_mix = mix - (1 << 32) if mix >= (1 << 31) else mix
    accel_arrays = (accel.sc_bounds, accel.sc_first, accel.sc_ncl,
                    accel.sc_order, accel.cl_bounds, accel.mats,
                    accel.tri_cols)

    if spp_per_call is None:
        spp_per_call = max(1, min(samples, (1 << 25) // (n_pix * depth)))

    film_m = jnp.zeros((3, n_pix // LANES, LANES), jnp.float32)
    s = 0
    while s < samples:
        spp = min(spp_per_call, samples - s)
        iparams = jnp.array(
            [s, seed_mix, width.bit_length() - 1, height, tpx_log2, 0, 0, 0],
            jnp.int32)
        film_m = film_m + _launch(
            iparams, cam_params, accel_arrays, tile_rows=tile_rows,
            depth=depth, spp=spp, n_sc=accel.num_superclusters,
            n_cl=accel.num_clusters, n_mats=accel.num_materials,
            ctris=accel.ctris, has_specular=scene.has_specular,
            n_tiles=n_tiles, count_runs=count_runs, interpret=interpret)
        s += spp
        if verbose:
            print(f"\rRendered: {s}/{samples} spp.", end="", flush=True)
    if verbose:
        print()
    flat = np.asarray(film_m).reshape(3, n_pix) / np.float32(samples)
    film = np.zeros((n_pix, 3), np.float32)
    film[_morton_to_raster(width, height)] = flat.T
    return Film((width, height), data=film.reshape(height, width, 3))


def count_tri_tests(camera: Camera, scene: Scene, samples: int = 8,
                    depth: int = 5, *, accel: Optional[BeamAccel] = None,
                    tile_rows: int = DEFAULT_TILE_ROWS,
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
                            tile_rows=tile_rows, count_runs=True,
                            interpret=interpret)
    return float(np.asarray(film.data)[..., 0].mean()) / depth * accel.ctris
