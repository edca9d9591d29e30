import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
"""On-hardware check of the round-5 band offsets: a Pallas megakernel
launch with h0 = 64 must reproduce rows 64.. of a full-film launch bit
for bit on the REAL chip (the virtual-mesh tests covered interpret mode
only; with one chip the tile axis is size 1, so the sharded drivers
never exercise a nonzero offset on silicon).  Same for the beam
kernel's tile0 offset, compared on the brightest film tiles so the
equality is non-vacuous."""
import os
import json
import dataclasses
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np                                   # noqa: E402
import jax.numpy as jnp                              # noqa: E402
import pathtracer_tpu as pt                          # noqa: E402
from pathtracer_tpu import meshes                    # noqa: E402
from pathtracer_tpu.ops.pallas import trace_kernel as tk  # noqa: E402
from pathtracer_tpu.ops.pallas import beam_kernel as bk   # noqa: E402

# --- pallas megakernel h0 offset ---------------------------------------
cam, scene = pt.cornell_box(res=(128, 128))
full = np.asarray(tk.render_film_pallas(cam, scene, 4, 3, seed=7).data)

loop = tk.DEFAULT_LOOP
cam_params = jnp.asarray(tk._camera_params(cam))
tri_params = (tk._triangle_params_plucker(scene, cam.pos)
              if loop == "plucker" else tk._triangle_params(scene))
table = tk._packed_table(scene)
mix = (7 * 0x85EBCA6B) & 0xFFFFFFFF
seed_mix = mix - (1 << 32) if mix >= (1 << 31) else mix
H0, BAND = 64, 32
iparams = jnp.array([0, seed_mix, 7, 128, H0], jnp.int32)
band = tk._launch(iparams, cam_params, tri_params, table, tile_rows=8,
                  n_tris=scene.num_tris, depth=3, spp=4,
                  has_specular=scene.has_specular, width=128, height=BAND,
                  interpret=False, loop=loop)
band = np.asarray(band) / 4.0
ok_h0 = np.array_equal(band, full[H0:H0 + BAND]) and band.max() > 0

# --- beam kernel tile0 offset ------------------------------------------
# Cornell box: the emitter is DIRECTLY visible, so depth-1 films are
# bright and the band equality is non-vacuous (the sphere scenes are
# black at depth 1 from their camera: the light is behind it).
cam2, scene2 = pt.cornell_box(res=(128, 128))
accel = bk._accel_for(scene2)
wp, hp = bk._padded_res(128, 128)
tile_rows = 16
n_tiles_full = wp * hp // (tile_rows * bk.LANES)
tpx_log2 = (tile_rows * bk.LANES).bit_length() - 1
mix = (5 * 0x85EBCA6B) & 0xFFFFFFFF
seed_mix2 = mix - (1 << 32) if mix >= (1 << 31) else mix
accel_arrays = (accel.sc_bounds, accel.sc_first, accel.sc_ncl,
                accel.sc_order, accel.mats, accel.cl_bounds,
                accel.tri_cols)
cam2_params = jnp.asarray(tk._camera_params(cam2))
kw = dict(tile_rows=tile_rows, depth=1, spp=2,
          n_sc=accel.num_superclusters, n_cl=accel.num_clusters,
          n_mats=accel.num_materials, ctris=accel.ctris,
          has_specular=scene2.has_specular,
          mats_inline=accel.mats_inline, staged=False, interpret=False)

full_launch = np.asarray(bk._launch(
    jnp.array([0, seed_mix2, 128, wp // bk._SQ, tpx_log2, 0, 0, 0],
              jnp.int32),
    cam2_params, accel_arrays, n_tiles=n_tiles_full, **kw))

# brightest tile -> non-vacuous band equality
tile_sums = full_launch.sum(axis=(0, 2)).reshape(
    n_tiles_full, tile_rows).sum(1)
NT = 2
TILE0 = min(int(tile_sums.argmax()), n_tiles_full - NT)
band_m = np.asarray(bk._launch(
    jnp.array([0, seed_mix2, 128, wp // bk._SQ, tpx_log2, TILE0, 0, 0],
              jnp.int32),
    cam2_params, accel_arrays, n_tiles=NT, **kw))
r0, r1 = TILE0 * tile_rows, (TILE0 + NT) * tile_rows
ok_t0 = (np.array_equal(band_m, full_launch[:, r0:r1, :])
         and band_m.max() > 0)
print(json.dumps({"pallas_h0_band_bit_exact_on_tpu": bool(ok_h0),
                  "beam_tile0_band_bit_exact_on_tpu": bool(ok_t0),
                  "tile0": TILE0,
                  "band_mean": float(band.mean()),
                  "beam_band_mean": float(band_m.mean())}))
