import sys; sys.path.insert(0, "/root/repo")
"""Interleaved A/B: staged vs legacy, garden, bench config (64spp d5)."""
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
SPP, DEPTH = 64, 5
for staged in (True, False):  # compile both
    np.asarray(bk.render_film_beam(cam, scene, SPP, DEPTH, accel=accel,
                                   staged=staged).data)
t = {True: [], False: []}
for rep in range(5):
    for staged in (True, False):
        t0 = time.perf_counter()
        f = bk.render_film_beam(cam, scene, SPP, DEPTH, accel=accel,
                                staged=staged)
        np.asarray(f.data)
        t[staged].append(time.perf_counter() - t0)
rays = 256 * 256 * SPP * DEPTH
for staged in (True, False):
    ts = sorted(t[staged])
    print(json.dumps({"staged": staged, "median_s": ts[2],
                      "all": [round(x, 4) for x in ts],
                      "rps": rays / ts[2]}), flush=True)
