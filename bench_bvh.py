#!/usr/bin/env python
"""Large-scene traversal benchmark (BASELINE config 4).

The reference cannot run this workload at all (its GLSL uniform arrays cap
at MAX_TRIANGLES=300, shader.h:76); the CPU path is its only recourse and is
single-threaded.  Measures ray-segment throughput on a ~10k-triangle
procedural scene; BENCH_BVH_BACKEND selects the backend (default "beam" —
the coherent-beam megakernel; "cluster" for per-pixel-independent
sampling; see README "Large scenes" and ROOFLINE.md).

Prints ONE JSON line.
"""

import json
import os
import time


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import dataclasses

    import pathtracer_tpu as pt
    from pathtracer_tpu import meshes

    res = int(os.environ.get("BENCH_RES", "256"))
    depth = int(os.environ.get("BENCH_DEPTH", "5"))
    spp = int(os.environ.get("BENCH_SPP", "64"))

    import numpy as np

    backend = os.environ.get("BENCH_BVH_BACKEND", "beam")
    # BENCH_BVH_SCENE: "sphere" (~10k tris) or "garden" (~100k tris)
    if os.environ.get("BENCH_BVH_SCENE", "sphere") == "garden":
        cam, sb = meshes.mesh_garden()
    else:
        cam, sb = meshes.sphere_in_box(50, 100)
    scene = sb.build()
    cam = dataclasses.replace(cam, res=(res, res))
    bvh = pt.build_bvh(scene)

    # Fetch-fenced timing (block_until_ready does not fence on relayed
    # accelerator transports, see bench.py): warm + drain, then measure.
    np.asarray(pt.render_film(cam, scene, samples=spp, depth=depth,
                              bvh=bvh, backend=backend).data)
    t0 = time.perf_counter()
    film = pt.render_film(cam, scene, samples=spp, depth=depth, bvh=bvh,
                          backend=backend)
    np.asarray(film.data)
    dt = time.perf_counter() - t0

    rays = res * res * spp * depth
    print(json.dumps({
        "metric": f"rays_per_sec_bvh_{scene.num_tris}tris_{res}",
        "value": rays / dt,
        "unit": "rays/s",
        "backend": backend,
        "tris": int(scene.num_tris),
        "bvh_nodes": int(bvh.num_nodes),
        "seconds": dt,
    }))


if __name__ == "__main__":
    main()
