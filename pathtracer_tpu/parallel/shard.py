"""Sharded rendering and training over the (tile, sample) mesh.

Sharding layout (the TPU answer to the reference's chunked GPU dispatch,
render.h:128-139, and the new distributed-training capability):

  * Scene arrays, shade table, camera — REPLICATED on every chip (the
    analog of GLSL uniform state, shader.h:76-79).
  * Film rows — sharded over the ``tile`` axis: each device traces its own
    horizontal band of the image.
  * Samples — sharded over the ``sample`` axis: each device traces a
    disjoint set of global sample indices (the per-(pixel,sample) RNG
    streams of rng.sample_seed make these independent by construction),
    and the band's partial film is ``psum``-reduced over ICI.
  * Material gradients — computed per shard and ``psum``-reduced over BOTH
    axes inside the sharded region, so the optimizer update is replicated.

Everything is expressed with ``shard_map`` over a ``Mesh``; XLA inserts the
collectives and overlaps them with compute where possible.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import rng as prng
from ..camera import Camera, get_rays
from ..image import Film
from ..ops import intersect as isect
from ..ops import trace as trace_ops
from ..scene import Scene
from .mesh import SAMPLE_AXIS, TILE_AXIS

LANES_TK = 128  # trace_kernel.LANES


def _trace_band(camera: Camera, scene: Scene, table, h0, width, band_h,
                spp, sample0, depth, seed):
    """Trace a (band_h x width) pixel band for ``spp`` samples starting at
    global sample index ``sample0``; returns the radiance SUM."""
    w = jax.lax.broadcasted_iota(jnp.int32, (band_h, width), 1)
    h = jax.lax.broadcasted_iota(jnp.int32, (band_h, width), 0) + h0

    def intersect(o, d):
        return isect.intersect_brute(o, d, scene.v1, scene.v2, scene.v3)

    def one_sample(acc, k):
        sidx = sample0 + k
        state = prng.sample_seed(w, h, camera.res[1], sidx, seed)
        state, u1 = prng.rand01(state)
        state, u2 = prng.rand01(state)
        ray_o, ray_d = get_rays(camera, w, h, u1, u2)
        rad = trace_ops.trace_rays(table, intersect, ray_o, ray_d, depth,
                                   state, has_specular=scene.has_specular)
        return acc + rad, None

    acc0 = jnp.zeros((band_h, width, 3), jnp.float32)
    acc, _ = jax.lax.scan(one_sample, acc0,
                          jnp.arange(spp, dtype=jnp.int32))
    return acc


def render_film_sharded(
    mesh: Mesh,
    camera: Camera,
    scene: Scene,
    samples: int,
    depth: int = 5,
    *,
    seed: int = prng.SEED,
) -> Film:
    """Distributed render: rows over ``tile``, samples over ``sample``.

    Requires height % n_tile == 0 and samples % n_sample == 0."""
    width, height = camera.res
    n_tile = mesh.shape[TILE_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    if height % n_tile or samples % n_sample:
        raise ValueError(
            f"height {height} % tile {n_tile} or samples {samples} % "
            f"sample {n_sample} != 0")
    band_h = height // n_tile
    spp_local = samples // n_sample

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P()),            # camera, scene replicated
        out_specs=P(TILE_AXIS, None, None),
        check_vma=False,
    )
    def run(camera, scene):
        ti = jax.lax.axis_index(TILE_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        table = trace_ops.shade_table(scene)
        acc = _trace_band(camera, scene, table, ti * band_h, width, band_h,
                          spp_local, si * spp_local, depth, seed)
        acc = jax.lax.psum(acc, SAMPLE_AXIS)
        return acc

    film = run(camera, scene) / jnp.float32(samples)
    return Film((width, height), data=jax.device_get(film))


def render_film_sharded_pallas(
    mesh: Mesh,
    camera: Camera,
    scene: Scene,
    samples: int,
    depth: int = 5,
    *,
    seed: int = prng.SEED,
    interpret: Optional[bool] = None,
) -> Film:
    """Distributed render through the PRODUCTION Pallas megakernel with
    TRUE pixel-tile sharding (round-4 verdict item 3): each device of the
    ``tile`` axis launches the fused kernel on its own horizontal film
    BAND (the kernel's h0 row offset makes band rows bit-identical to the
    same rows of a full-film launch — the analog of the reference's
    fragment-grid pixel partition, render.h:128-139), and each device of
    the ``sample`` axis traces a disjoint global-sample window of that
    band.  The psum runs over the ``sample`` axis ONLY and the film stays
    sharded over ``tile``, so per-device film memory and psum payload
    scale with the BAND, not the full film.

    Falls back to pure sample-parallelism (all devices flatten into
    sample windows, full-film psum) when the film does not band evenly —
    correct for any divisible sample count, just not band-scaling."""
    from ..ops.pallas import trace_kernel as tk

    width, height = camera.res
    n_dev = mesh.devices.size
    n_tile = mesh.shape[TILE_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    if interpret is None:
        # The kernels run on the MESH's devices, which need not be the
        # default backend: under the TPU tunnel a virtual-CPU-mesh dry
        # run still reports default_backend() == "tpu" (the platform
        # plugin registers itself regardless of jax_platforms), and a
        # non-interpret Pallas call on CPU devices is an error.
        interpret = mesh.devices.flat[0].platform == "cpu"

    if width <= 0 or width & (width - 1):
        raise ValueError(
            f"render_film_sharded_pallas needs a power-of-two width "
            f"(got {width}); use render_film_sharded")
    width_log2 = width.bit_length() - 1

    def plan_rows(n_pix):
        tile_rows = tk.DEFAULT_TILE_ROWS
        while n_pix % (tile_rows * LANES_TK):
            tile_rows //= 2
            if tile_rows == 0:
                raise ValueError(
                    f"untileable resolution {width}x{height} for the "
                    f"Pallas megakernel (pixel count not a multiple of "
                    f"{LANES_TK})")
        return tile_rows

    banded = (height % n_tile == 0
              and (height // n_tile) * width % LANES_TK == 0
              and samples % n_sample == 0)
    if banded:
        band_h = height // n_tile
        spp_local = samples // n_sample
        tile_rows = plan_rows(band_h * width)
    else:
        if samples % n_dev:
            raise ValueError(
                f"samples {samples} % devices {n_dev} != 0")
        band_h = height
        spp_local = samples // n_dev
        tile_rows = plan_rows(width * height)

    # Host-side packing happens ONCE here (shard_map lifts closures into
    # tracers, so it cannot run inside the body); only the per-device
    # band/sample-window offsets are traced.
    loop = tk.DEFAULT_LOOP
    cam_params = jnp.asarray(tk._camera_params(camera))
    tri_params = (tk._triangle_params_plucker(scene, camera.pos)
                  if loop == "plucker" else tk._triangle_params(scene))
    table = tk._packed_table(scene)
    mix = (int(seed) * 0x85EBCA6B) & 0xFFFFFFFF
    seed_mix = mix - (1 << 32) if mix >= (1 << 31) else mix

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P()),       # packed params replicated
        out_specs=(P(TILE_AXIS, None, None) if banded else P()),
        check_vma=False,
    )
    def run(cam_params, tri_params, table):
        ti = jax.lax.axis_index(TILE_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        if banded:
            sample0 = si * spp_local
            h0 = ti * band_h
        else:
            sample0 = (ti * n_sample + si) * spp_local
            h0 = jnp.int32(0)
        iparams = jnp.array([0, seed_mix, width_log2, height, 0],
                            jnp.int32)
        iparams = iparams.at[0].set(sample0).at[4].set(h0)
        film_sum = tk._launch(
            iparams, cam_params, tri_params, table,
            tile_rows=tile_rows, n_tris=scene.num_tris, depth=depth,
            spp=spp_local, has_specular=scene.has_specular,
            width=width, height=band_h, interpret=interpret, loop=loop)
        return jax.lax.psum(
            film_sum,
            SAMPLE_AXIS if banded else (TILE_AXIS, SAMPLE_AXIS))

    film = run(cam_params, tri_params, table) / jnp.float32(samples)
    return Film((width, height), data=jax.device_get(film))


def render_film_sharded_beam(
    mesh: Mesh,
    camera: Camera,
    scene: Scene,
    samples: int,
    depth: int = 5,
    *,
    seed: int = prng.SEED,
    interpret: Optional[bool] = None,
) -> Film:
    """Distributed render through the coherent-beam megakernel (the
    large-scene production path, ops/pallas/beam_kernel.py) — round-4
    verdict item 2: the scenes that most need more chips (100k+ tris,
    minutes-long showcase renders) can now use the whole mesh.

    Layout: the accel arrays replicate like uniforms (shader.h:76-79
    analog); the padded film's 64x64 Morton-square ROWS band over the
    ``tile`` axis (each device launches the kernel on its own contiguous
    tile range via the tile0 offset — band tiles are bit-identical to a
    full-film launch), samples band over the ``sample`` axis, and the
    psum runs over ``sample`` only.  Falls back to pure
    sample-parallelism when the square-row count does not divide."""
    from ..ops.pallas import beam_kernel as bkn
    from ..ops.pallas import trace_kernel as tk

    width, height = camera.res
    n_dev = mesh.devices.size
    n_tile = mesh.shape[TILE_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    if interpret is None:
        # mesh devices, not default_backend(): see render_film_sharded_pallas
        interpret = mesh.devices.flat[0].platform == "cpu"

    accel = bkn._accel_for(scene)
    if accel.num_superclusters > bkn.MAX_BEAM_SC:
        raise ValueError(
            f"{accel.num_superclusters} superclusters > "
            f"{bkn.MAX_BEAM_SC}; rebuild with larger sc_tris")
    wp, hp = bkn._padded_res(width, height)
    n_pix = wp * hp
    tile_rows = min(bkn.DEFAULT_TILE_ROWS, bkn._SQ_PIX // bkn.LANES)
    while bkn._SQ_PIX % (tile_rows * bkn.LANES):
        tile_rows //= 2
    n_tiles = n_pix // (tile_rows * bkn.LANES)
    tpx_log2 = (tile_rows * bkn.LANES).bit_length() - 1
    tiles_per_sqrow = (wp // bkn._SQ) * (bkn._SQ_PIX
                                         // (tile_rows * bkn.LANES))

    banded = (n_tiles % n_tile == 0
              # device tile ranges must cover whole square-rows so the
              # host de-Morton stays a single gather
              and (n_tiles // n_tile) % tiles_per_sqrow == 0
              and samples % n_sample == 0)
    if banded:
        tiles_local = n_tiles // n_tile
        spp_local = samples // n_sample
    else:
        if samples % n_dev:
            raise ValueError(
                f"samples {samples} % devices {n_dev} != 0")
        tiles_local = n_tiles
        spp_local = samples // n_dev

    cam_params = jnp.asarray(tk._camera_params(camera))
    mix = (int(seed) * 0x85EBCA6B) & 0xFFFFFFFF
    seed_mix = mix - (1 << 32) if mix >= (1 << 31) else mix
    accel_arrays = (accel.sc_bounds, accel.sc_first, accel.sc_ncl,
                    accel.sc_order, accel.mats, accel.cl_bounds,
                    accel.tri_cols)
    staged = accel.num_clusters >= bkn.STAGED_MIN_CL

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(),) * 8,            # camera + accel replicated
        out_specs=(P(None, TILE_AXIS, None) if banded else P()),
        check_vma=False,
    )
    def run(cam_params, *accel_arrays):
        ti = jax.lax.axis_index(TILE_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        if banded:
            sample0 = si * spp_local
            tile0 = ti * tiles_local
        else:
            sample0 = (ti * n_sample + si) * spp_local
            tile0 = jnp.int32(0)
        iparams = jnp.array(
            [0, seed_mix, height, wp // bkn._SQ, tpx_log2, 0, 0, 0],
            jnp.int32)
        iparams = iparams.at[0].set(sample0).at[5].set(tile0)
        film_m = bkn._launch(
            iparams, cam_params, accel_arrays, tile_rows=tile_rows,
            depth=depth, spp=spp_local, n_sc=accel.num_superclusters,
            n_cl=accel.num_clusters, n_mats=accel.num_materials,
            ctris=accel.ctris, has_specular=scene.has_specular,
            n_tiles=tiles_local, mats_inline=accel.mats_inline,
            staged=staged, interpret=interpret)
        return jax.lax.psum(
            film_m, SAMPLE_AXIS if banded else (TILE_AXIS, SAMPLE_AXIS))

    film_m = run(cam_params, *accel_arrays) / jnp.float32(samples)
    flat = np.asarray(jax.device_get(film_m)).reshape(3, n_pix)
    img = np.zeros((n_pix, 3), np.float32)
    img[bkn._sq_to_raster(wp, hp)] = flat.T
    return Film((width, height),
                data=img.reshape(hp, wp, 3)[:height, :width])


def make_sharded_train_step(
    mesh: Mesh,
    camera: Camera,
    scene: Scene,
    target: jnp.ndarray,
    samples: int,
    depth: int = 5,
    *,
    seed: int = prng.SEED,
    optimizer=None,
    param_transform=None,
):
    """Build a jitted sharded inverse-rendering train step.

    The loss is MSE between the distributed linear film and ``target``.
    Returns ``step(params, opt_state, step_idx) -> (params, opt_state,
    loss)`` where params/opt_state are replicated pytrees of the
    *unconstrained* parameters (see inverse.py transforms); gradients are
    psum-reduced over the whole mesh inside the sharded region.
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(2e-2)
    if param_transform is None:
        param_transform = lambda p: p  # noqa: E731

    width, height = camera.res
    n_tile = mesh.shape[TILE_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    band_h = height // n_tile
    spp_local = samples // n_sample
    n_dev = n_tile * n_sample

    def local_loss(params, target_band, ti, si, step_idx):
        mats = param_transform(params)
        sc = scene.replace_materials(**mats)
        table = trace_ops.shade_table(sc)
        # rotate sample indices per optimizer step for fresh noise
        sample0 = si * spp_local + step_idx * samples
        acc = _trace_band(camera, sc, table, ti * band_h, width, band_h,
                          spp_local, sample0, depth, seed)
        film_band = acc / jnp.float32(spp_local)
        # Per-band MSE; averaged over the mesh below.
        return jnp.mean((film_band - target_band) ** 2)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(TILE_AXIS, None, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def loss_and_grad(params, target_shard, step_idx):
        ti = jax.lax.axis_index(TILE_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        loss, g = jax.value_and_grad(local_loss)(
            params, target_shard, ti, si, step_idx)
        # Average over every shard: bands partition pixels; sample shards
        # are independent estimates of the same band loss/grad.
        loss = jax.lax.pmean(loss, (TILE_AXIS, SAMPLE_AXIS))
        g = jax.lax.pmean(g, (TILE_AXIS, SAMPLE_AXIS))
        return loss, g

    target_sharded = jax.device_put(
        target, NamedSharding(mesh, P(TILE_AXIS, None, None)))

    @jax.jit
    def step(params, opt_state, step_idx):
        loss, g = loss_and_grad(params, target_sharded, step_idx)
        updates, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(params):
        return optimizer.init(params)

    return step, init
