import sys; sys.path.insert(0, "/root/repo")
import sys; sys.path.insert(0, "/root/repo")
import os, time, dataclasses, json
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax.numpy as jnp
import pathtracer_tpu as pt
from pathtracer_tpu import diff, inverse, meshes

cam, gsb = meshes.mesh_garden()
scene = gsb.build()
cam = dataclasses.replace(cam, res=(64, 64))
target = jnp.asarray(np.asarray(pt.render_film(
    cam, scene, samples=64, depth=4, backend="beam").data))
t0 = time.perf_counter()
mats, losses = inverse.recover_materials(
    cam, scene, target, steps=3, samples=8, depth=4, lr=0.08,
    backend="cluster", optimize=("albedo",), verbose=True)
print(json.dumps({"ok": bool(np.isfinite(losses).all()),
                  "losses": [float(x) for x in losses],
                  "wall_total": time.perf_counter() - t0}))
