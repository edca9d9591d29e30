"""MXU-offloaded Pallas path-tracing kernel.

The second-generation TPU megakernel.  The dense kernel (trace_kernel.py)
broadcasts one triangle at a time against a planar ray tile and is bound by
the VPU at ~55 vector ops per (ray, triangle).  This kernel moves the
intersection *arithmetic* onto the 128x128 systolic array (MXU) — the unit
with ~50x the FLOPs of the VPU — by exploiting that all four Moller-Trumbore
quantities are LINEAR in the ray's Plucker coordinates:

  For a triangle (v1, e1=v2-v1, e2=v3-v1) with unnormalized normal
  N = e1 x e2, and a ray (o, d) with moment c = o x d:

      a   = det      = -N . d                              (linear in d)
      p   = u * a    =  e2 . c - (e2 x v1) . d             (linear in c, d)
      q   = v * a    = -e1 . c - (v1 x e1) . d             (linear in c, d)
      r   = t * a    =   N . o - N . v1                    (linear in o, 1)

  (Derived by scalar-triple-product expansion of the standard formulation
  used in ops/intersect.py / triangle.h:25-44; same hit set, same t.)

So with the per-ray feature vector F = [d(3), c(3), o(3), 1] (padded to 16)
the intersection of a 1024-ray tile against all TP triangles is ONE matmul

      Q (4*TP, 1024) = A (4*TP, 16) @ F (16, 1024)        [MXU]

followed by sign tests that never divide by `a`:

      u >= 0      <=>  p*a >= 0
      v >= 0      <=>  q*a >= 0
      u + v <= 1  <=>  (p+q)*a <= a*a
      t = r / a   (one fast reciprocal; t > 0 tested directly)

Winner selection is a sublane min over the triangle axis, and the winning
triangle's 8 packed shading features are gathered with a second tiny matmul

      feats (8, 1024) = tabT (8, TP) @ onehot (TP, 1024)  [MXU]

(onehot is count-normalized so exact-t ties average their features instead
of summing).  The remaining VPU work is ~22 ops per (ray, triangle) — about
2.5x less than the dense kernel — plus the unchanged per-ray RNG / BRDF
sampling / shading, which consume bit-identical random streams to
trace_kernel.py, so the two backends are statistically interchangeable.

Numerics: the matmul runs at Precision.HIGHEST (fp32-accurate passes).  The
Plucker expansion re-associates the subtraction (o - v1) into per-term dot
products of magnitude ~|o||v|, costing a few ulps of fp32 relative to the
dense kernel — harmless against the 1e-6 EPS determinant cutoff and the
1e-4 ray bias (validated by the PSNR golden tests at 1024x1024).

Reference analog: shader.h:92-193 (GLSL intersection + traversal); this
file is a re-architecture for the MXU, not a translation.
"""

from __future__ import annotations

import functools
from typing import Optional

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
from .trace_kernel import (
    _GOLDEN,
    _camera_params,
    _hash,
    _packed_table,
    _rand01,
    _recip,
)

LANES = 128
TILE_ROWS = 8                    # 1024 rays per tile (one lane-group matmul)
MAX_MXU_TRIS = 128               # (4*TP, 1024) intermediates stay < ~2 MB
N_FEATURES = 16                  # Plucker features padded to a sublane tile

# Matmul precision for the Plucker contraction.  HIGHEST (f32 on the MXU)
# is required for hit accuracy; the bf16 ablation was measured and rejected
# (visible edge artifacts, no net speedup — the epilogue dominates).
_PRECISION = jax.lax.Precision.HIGHEST


def _plucker_matrix(scene: Scene, tp: int) -> np.ndarray:
    """A (4*TP, 16): rows [0,TP)=a, [TP,2TP)=p, [2TP,3TP)=q, [3TP,4TP)=r.

    Feature columns: [0:3]=d, [3:6]=c=o x d, [6:9]=o, [9]=1, [10:16]=0.
    Padding triangles get all-zero rows -> a=0 -> rejected by the EPS test.
    """
    n = scene.num_tris
    hv1, hv2, hv3 = scene.host_verts()
    v1 = hv1.astype(np.float64)
    e1 = hv2.astype(np.float64) - v1
    e2 = hv3.astype(np.float64) - v1
    nrm = np.cross(e1, e2)

    A = np.zeros((4 * tp, N_FEATURES), np.float64)
    A[0:n, 0:3] = -nrm                                   # a = -N.d
    A[tp : tp + n, 0:3] = -np.cross(e2, v1)              # p: d coeffs
    A[tp : tp + n, 3:6] = e2                             # p: c coeffs
    A[2 * tp : 2 * tp + n, 0:3] = -np.cross(v1, e1)      # q: d coeffs
    A[2 * tp : 2 * tp + n, 3:6] = -e1                    # q: c coeffs
    A[3 * tp : 3 * tp + n, 6:9] = nrm                    # r: o coeffs
    A[3 * tp : 3 * tp + n, 9] = -np.sum(nrm * v1, -1)    # r: const
    return A.astype(np.float32)


def _kernel(iparams_ref, cam_ref, amat_ref, tabt_ref, film_ref, *,
            tp: int, depth: int, spp: int, has_specular: bool,
            spec_tries: int):
    """One 1024-ray film tile.  Inputs:
    iparams: (4,) i32 SMEM   [sample_idx0, seed_mix, width_log2, res_y]
    cam:     (16,) f32 SMEM  (see trace_kernel._camera_params)
    amat:    (4*TP, 16) f32 VMEM  Plucker coefficient matrix
    tabt:    (8, TP) f32 VMEM     transposed packed shade table
    out film: (3, TILE_ROWS, 128) f32 radiance SUM over the spp samples.
    """
    n_rays = TILE_ROWS * LANES
    s0 = iparams_ref[0]
    seed_mix = iparams_ref[1].astype(jnp.uint32)
    width_log2 = iparams_ref[2]
    res_y = iparams_ref[3]

    tile = pl.program_id(0)
    pix = (tile * n_rays
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1))
    w = pix & ((1 << width_log2) - 1)
    h = pix >> width_log2
    pix_seed = (h.astype(jnp.uint32)
                + w.astype(jnp.uint32) * res_y.astype(jnp.uint32)
                + np.uint32(1))
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    px, py, pz = cam_ref[0], cam_ref[1], cam_ref[2]
    rx, ry, rz = cam_ref[3], cam_ref[4], cam_ref[5]
    ux, uy, uz = cam_ref[6], cam_ref[7], cam_ref[8]
    fx, fy, fz = cam_ref[9], cam_ref[10], cam_ref[11]
    cell, hvx, hvy = cam_ref[12], cam_ref[13], cam_ref[14]
    pix_off = cam_ref[15]

    amat = amat_ref[:]
    tabt = tabt_ref[:]

    def row(x):
        return x.reshape(1, n_rays)

    def planar(x):
        return x.reshape(TILE_ROWS, LANES)

    zrow = jnp.zeros((1, n_rays), jnp.float32)
    onerow = jnp.ones((1, n_rays), jnp.float32)

    def one_bounce(carry):
        (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
         rad_r, rad_g, rad_b, alive, seed) = carry

        # ---- Plucker features and the intersection matmul ---------------
        cx = oy * dz - oz * dy
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        feat = jnp.concatenate(
            [row(dx), row(dy), row(dz), row(cx), row(cy), row(cz),
             row(ox), row(oy), row(oz), onerow,
             zrow, zrow, zrow, zrow, zrow, zrow], axis=0)   # (16, N)
        qmat = jnp.dot(amat, feat,
                       preferred_element_type=jnp.float32,
                       precision=_PRECISION)  # (4*TP, N)
        a = qmat[0:tp]
        p = qmat[tp : 2 * tp]
        q = qmat[2 * tp : 3 * tp]
        r = qmat[3 * tp : 4 * tp]

        t = r * _recip(a)
        valid = ((jnp.abs(a) >= EPS)
                 & (p * a >= 0.0) & (q * a >= 0.0)
                 & ((p + q) * a <= a * a)
                 & (t > 0.0))
        tm = jnp.where(valid, t, FLOAT_INF)                  # (TP, N)
        best = jnp.min(tm, axis=0, keepdims=True)            # (1, N)
        oh = ((tm == best) & (best < FLOAT_INF)).astype(jnp.float32)
        cnt = jnp.sum(oh, axis=0, keepdims=True)
        inv = jnp.where(cnt > 0.0, 1.0 / cnt, 0.0)
        feats = jnp.dot(tabt, oh,
                        preferred_element_type=jnp.float32,
                        precision=_PRECISION) * inv  # (8, N)

        best_t = planar(best)
        col_r = planar(feats[0:1])
        col_g = planar(feats[1:2])
        col_b = planar(feats[2:3])
        rough = planar(feats[3:4])
        nx = planar(feats[4:5])
        ny = planar(feats[5:6])
        nz = planar(feats[6:7])
        flags = planar(feats[7:8])

        # ---- shading / sampling: identical to trace_kernel --------------
        is_emit = flags > 1.5
        emitf = is_emit.astype(jnp.float32)
        albf = 1.0 - emitf
        alb_r, alb_g, alb_b = col_r * albf, col_g * albf, col_b * albf
        em_r, em_g, em_b = col_r * emitf, col_g * emitf, col_b * emitf

        hit = (best_t < FLOAT_INF) & alive
        hitf = hit.astype(jnp.float32)
        rad_r = rad_r + hitf * thr_r * em_r
        rad_g = rad_g + hitf * thr_g * em_g
        rad_b = rad_b + hitf * thr_b * em_b

        cont = hit & ~is_emit

        ndotd = nx * dx + ny * dy + nz * dz
        flip = jnp.where(ndotd < 0.0, 1.0, -1.0)
        nx, ny, nz = nx * flip, ny * flip, nz * flip

        seed, u1 = _rand01(seed)
        seed, u2 = _rand01(seed)
        xx = 2.0 * u1 - 1.0
        ct = jnp.sqrt(jnp.maximum(1.0 - xx * xx, 0.0))
        phi = np.float32(2.0 * np.pi) * u2
        sdx = ct * jnp.cos(phi)
        sdy = ct * jnp.sin(phi)
        sdz = -xx
        sflip = jnp.where(sdx * nx + sdy * ny + sdz * nz < 0.0, -1.0, 1.0)
        ndx, ndy, ndz = sdx * sflip, sdy * sflip, sdz * sflip

        if has_specular:
            ddn = 2.0 * (dx * nx + dy * ny + dz * nz)
            mx, my, mz = dx - ddn * nx, dy - ddn * ny, dz - ddn * nz
            cands = []
            for _ in range(spec_tries):
                seed, c1 = _rand01(seed)
                seed, c2 = _rand01(seed)
                seed, c3 = _rand01(seed)
                cands.append((c1, c2, c3))
            cx_, cy_, cz_ = mx, my, mz
            for c1, c2, c3 in reversed(cands):
                jx = mx + (c1 - 0.5) * rough
                jy = my + (c2 - 0.5) * rough
                jz = mz + (c3 - 0.5) * rough
                ok = (jx * nx + jy * ny + jz * nz) >= 0.0
                cx_ = jnp.where(ok, jx, cx_)
                cy_ = jnp.where(ok, jy, cy_)
                cz_ = jnp.where(ok, jz, cz_)
            sinv = jax.lax.rsqrt(cx_ * cx_ + cy_ * cy_ + cz_ * cz_)
            sx_, sy_, sz_ = cx_ * sinv, cy_ * sinv, cz_ * sinv
            spec = (flags > 0.5) & ~is_emit
            ndx = jnp.where(spec, sx_, ndx)
            ndy = jnp.where(spec, sy_, ndy)
            ndz = jnp.where(spec, sz_, ndz)

        cos = nx * ndx + ny * ndy + nz * ndz
        w2c = 2.0 * cos
        thr_r = thr_r * jnp.where(cont, w2c * alb_r, 1.0)
        thr_g = thr_g * jnp.where(cont, w2c * alb_g, 1.0)
        thr_b = thr_b * jnp.where(cont, w2c * alb_b, 1.0)

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
        return (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                rad_r, rad_g, rad_b, cont, seed)

    def one_sample(s, acc):
        acc_r, acc_g, acc_b = acc
        sidx = (s0 + s).astype(jnp.uint32)
        seed = _hash(pix_seed ^ (sidx * _GOLDEN))
        seed = _hash(seed ^ seed_mix)

        seed, u1 = _rand01(seed)
        seed, u2 = _rand01(seed)
        x = (wf + pix_off + u1) * cell - hvx
        y = (hf + pix_off + u2) * cell - hvy
        dx = x * rx + y * ux + fx
        dy = x * ry + y * uy + fy
        dz = x * rz + y * uz + fz
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv, dy * inv, dz * inv

        zeros = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
        ones = jnp.ones((TILE_ROWS, LANES), jnp.float32)
        carry = (zeros + px, zeros + py, zeros + pz, dx, dy, dz,
                 ones, ones, ones, zeros, zeros, zeros,
                 jnp.ones((TILE_ROWS, LANES), bool), seed)
        for _ in range(depth):
            carry = one_bounce(carry)
        rad_r, rad_g, rad_b = carry[9], carry[10], carry[11]
        return acc_r + rad_r, acc_g + rad_g, acc_b + rad_b

    zeros = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
    acc_r, acc_g, acc_b = jax.lax.fori_loop(
        0, spp, one_sample, (zeros, zeros, zeros))
    film_ref[0] = acc_r
    film_ref[1] = acc_g
    film_ref[2] = acc_b


@functools.partial(
    jax.jit,
    static_argnames=("tp", "depth", "spp", "has_specular",
                     "width", "height", "interpret"),
)
def _launch(iparams, cam_params, amat, tabt, *, tp, depth, spp,
            has_specular, width, height, interpret=False):
    n_pix = width * height
    rays_per_tile = TILE_ROWS * LANES
    assert n_pix % rays_per_tile == 0, (n_pix, rays_per_tile)
    n_tiles = n_pix // rays_per_tile

    kern = functools.partial(
        _kernel, tp=tp, depth=depth, spp=spp,
        has_specular=has_specular, spec_tries=mat.SPECULAR_TRIES)

    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, TILE_ROWS, LANES), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pix // LANES, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(iparams, cam_params, amat, tabt)
    return out.reshape(3, height, width).transpose(1, 2, 0)


def render_film_mxu(camera: Camera, scene: Scene, samples: int,
                    depth: int = 5, *, seed: int = 1,
                    spp_per_call: Optional[int] = None,
                    interpret: bool = False,
                    verbose: bool = False) -> Film:
    """Render the sample-averaged linear film with the MXU kernel."""
    if scene.num_tris > MAX_MXU_TRIS:
        raise ValueError(
            f"mxu kernel supports <= {MAX_MXU_TRIS} triangles "
            f"(got {scene.num_tris}); use the BVH backend")
    width, height = camera.res
    if width & (width - 1):
        raise ValueError(
            f"mxu backend requires a power-of-two image width (got {width})")
    n_pix = width * height
    if n_pix % (TILE_ROWS * LANES):
        raise ValueError(
            f"mxu backend needs width*height divisible by "
            f"{TILE_ROWS * LANES} (got {width}x{height})")
    width_log2 = width.bit_length() - 1

    tp = max(8, -(-scene.num_tris // 8) * 8)   # triangle axis, sublane-padded

    if spp_per_call is None:
        spp_per_call = max(1, min(samples, (1 << 24) // n_pix))

    cam_params = jnp.asarray(_camera_params(camera))
    amat = jnp.asarray(_plucker_matrix(scene, tp))
    full = _packed_table(scene)                       # (T, 8)
    tabt = jnp.zeros((8, tp), jnp.float32).at[:, : scene.num_tris].set(
        full.T)

    mix = (int(seed) * 0x85EBCA6B) & 0xFFFFFFFF
    seed_mix = mix - (1 << 32) if mix >= (1 << 31) else mix

    film = jnp.zeros((height, width, 3), jnp.float32)
    s = 0
    while s < samples:
        spp = min(spp_per_call, samples - s)
        iparams = jnp.array([s, seed_mix, width_log2, height], jnp.int32)
        film = film + _launch(
            iparams, cam_params, amat, tabt,
            tp=tp, depth=depth, spp=spp,
            has_specular=scene.has_specular,
            width=width, height=height, interpret=interpret)
        s += spp
        if verbose:
            print(f"\rRendered: {s}/{samples} spp.", end="", flush=True)
    if verbose:
        print()
    film = film / np.float32(samples)
    return Film((width, height), data=film.block_until_ready())
