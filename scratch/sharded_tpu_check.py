import sys; sys.path.insert(0, "/root/repo")
"""On-hardware sanity: sharded pallas + beam renderers on a 1-device
TPU mesh must be bit-identical to the single-chip kernels (the virtual
8-device mesh validates the sharding logic in interpret mode; this run
validates the REAL Mosaic kernels under shard_map on the chip)."""
import os, json, dataclasses
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax
import pathtracer_tpu as pt
from pathtracer_tpu import meshes
from pathtracer_tpu.parallel import make_mesh
from pathtracer_tpu.parallel.shard import (render_film_sharded_pallas,
                                           render_film_sharded_beam)
from pathtracer_tpu.ops.pallas import beam_kernel, trace_kernel

mesh = make_mesh(1)
cam, scene = pt.cornell_box(res=(256, 256))
f_sh = render_film_sharded_pallas(mesh, cam, scene, samples=8, depth=3)
f_1 = trace_kernel.render_film_pallas(cam, scene, 8, 3)
ok_p = np.array_equal(np.asarray(f_sh.data), np.asarray(f_1.data))

cam2, sb = meshes.sphere_in_box(50, 100)
scene2 = sb.build()
cam2 = dataclasses.replace(cam2, res=(128, 128))
f_shb = render_film_sharded_beam(mesh, cam2, scene2, samples=8, depth=3)
f_1b = beam_kernel.render_film_beam(cam2, scene2, 8, 3)
ok_b = np.array_equal(np.asarray(f_shb.data), np.asarray(f_1b.data))
print(json.dumps({"pallas_sharded_bit_exact_on_tpu": ok_p,
                  "beam_sharded_bit_exact_on_tpu": ok_b,
                  "film_means": [float(np.asarray(f_sh.data).mean()),
                                 float(np.asarray(f_shb.data).mean())]}))
