import sys; sys.path.insert(0, "/root/repo")
"""Depth-resolved garden cost: staged vs legacy per added bounce."""
import os, time, dataclasses, json
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import pathtracer_tpu as pt
from pathtracer_tpu import meshes
from pathtracer_tpu.ops.pallas import beam_kernel as bk

cam, gsb = meshes.mesh_garden()
scene = gsb.build()
cam = dataclasses.replace(cam, res=(256, 256))
accel = bk._accel_for(scene)
SPP = 32
rows = []
for staged in (True, False):
    for depth in (1, 2, 3, 5):
        f = bk.render_film_beam(cam, scene, SPP, depth, accel=accel,
                                staged=staged)
        np.asarray(f.data)  # compile+drain
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f = bk.render_film_beam(cam, scene, SPP, depth, accel=accel,
                                    staged=staged)
            np.asarray(f.data)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        sec = ts[1]
        rays = 256 * 256 * SPP * depth
        rows.append({"staged": staged, "depth": depth, "sec": sec,
                     "rps": rays / sec,
                     "us_per_tile_bounce": sec / (32 * SPP * depth) * 1e6})
        print(json.dumps(rows[-1]), flush=True)
