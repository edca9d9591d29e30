#!/usr/bin/env python
"""Headline benchmarks vs the reference (BASELINE.md), one JSON line.

Three workloads:
  * cornell1024  — diffuse Cornell box, 1024^2, depth 5 (reference: 112 s
    for 10k spp on its GPU => ~4.68e8 rays/s, README.md:25-29).
  * specular1024 — modified Cornell (specular walls, roughness 0.05),
    1024^2, depth 5 (reference: 230 s avg => ~2.28e8 rays/s,
    README.md:35-39).
  * bvh10k       — ~10k-triangle procedural scene through the Pallas
    cluster-traversal backend.  The reference GPU path cannot run this at
    all (uniform arrays cap at MAX_TRIANGLES=300, shader.h:76); baseline
    is its Cornell throughput as the only available anchor.

Timing discipline: the accelerator transport is ASYNCHRONOUS and
``block_until_ready`` does not fence on relayed backends, so every timed
region ends with a host fetch of the film (np.asarray) — the number is
honest end-to-end throughput including readback.

Prints ONE JSON line: the headline cornell metric, with the other two
workloads under "extra" (same schema per entry).
"""

import json
import os
import sys
import time

BASE_CORNELL = 5.24288e10 / 112.0   # ~4.68e8 rays/s (README.md:25-29)
BASE_SPECULAR = 5.24288e10 / 230.0  # ~2.28e8 rays/s (README.md:35-39)


def _measure(render, rays):
    """Compile+drain, then honest fetch-fenced steady-state seconds."""
    import numpy as np
    film = render()
    np.asarray(film.data)  # compile + drain the async queue
    t0 = time.perf_counter()
    film = render()
    np.asarray(film.data)  # fence: host fetch
    dt = time.perf_counter() - t0
    return rays / dt


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import dataclasses

    import pathtracer_tpu as pt
    from pathtracer_tpu import meshes

    depth = int(os.environ.get("BENCH_DEPTH", "5"))
    spp = int(os.environ.get("BENCH_SPP", "512"))

    results = []

    # 1. Diffuse Cornell (the headline).
    cam, scene = pt.cornell_box(res=(1024, 1024))
    rps = _measure(
        lambda: pt.render_film(cam, scene, samples=spp, depth=depth,
                               backend="pallas"),
        1024 * 1024 * spp * depth)
    results.append({
        "metric": "rays_per_sec_cornell1024", "value": rps,
        "unit": "rays/s", "vs_baseline": rps / BASE_CORNELL,
    })

    # 2. Specular modified Cornell (roughness 0.05 column of the sweep).
    cam_s, scene_s = pt.modified_cornell(0.05, res=(1024, 1024))
    rps_s = _measure(
        lambda: pt.render_film(cam_s, scene_s, samples=spp, depth=depth,
                               backend="pallas"),
        1024 * 1024 * spp * depth)
    results.append({
        "metric": "rays_per_sec_specular1024", "value": rps_s,
        "unit": "rays/s", "vs_baseline": rps_s / BASE_SPECULAR,
    })

    # 3. Large scene (~10k tris) through the cluster backend.
    bres = int(os.environ.get("BENCH_BVH_RES", "256"))
    bspp = int(os.environ.get("BENCH_BVH_SPP", "256"))
    cam_b, sb = meshes.sphere_in_box(50, 100)
    scene_b = sb.build()
    cam_b = dataclasses.replace(cam_b, res=(bres, bres))
    bvh = pt.build_bvh(scene_b)
    rps_b = _measure(
        lambda: pt.render_film(cam_b, scene_b, samples=bspp, depth=depth,
                               bvh=bvh, backend="cluster"),
        bres * bres * bspp * depth)
    results.append({
        "metric": f"rays_per_sec_bvh_{scene_b.num_tris}tris_{bres}",
        "value": rps_b, "unit": "rays/s",
        "vs_baseline": rps_b / BASE_CORNELL,
    })

    head = dict(results[0])
    head["extra"] = results[1:]
    print(json.dumps(head))


if __name__ == "__main__":
    main()
