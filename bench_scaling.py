#!/usr/bin/env python
"""Scaling benchmark: rays/s across mesh sizes.

On real multi-chip hardware this measures ICI scaling of the sharded
renderer (BASELINE target: >=90% linear 1 host -> 4 hosts).  On a single
-chip or CPU environment it validates the mechanism on a virtual device mesh
(set JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=8
— or pass --cpu 8 which does it for you, before jax initializes).

Prints one JSON line per mesh size.
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--depth", type=int, default=5)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}").strip()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import pathtracer_tpu as pt
    from pathtracer_tpu.parallel import make_mesh, render_film_sharded

    n = len(jax.devices())
    cam, scene = pt.cornell_box(res=(args.res, args.res))
    rays = args.res * args.res * args.spp * args.depth

    results = []
    size = 1
    while size <= n:
        mesh = make_mesh(size)
        import numpy as np
        # Fetch-fenced timing: block_until_ready does not fence on relayed
        # accelerator transports (see bench.py).
        np.asarray(render_film_sharded(mesh, cam, scene, samples=args.spp,
                                       depth=args.depth))  # warm + drain
        t0 = time.perf_counter()
        np.asarray(render_film_sharded(mesh, cam, scene, samples=args.spp,
                                       depth=args.depth))
        dt = time.perf_counter() - t0
        r = {"devices": size, "mesh": dict(mesh.shape),
             "rays_per_sec": rays / dt, "seconds": dt}
        if results:
            base = results[0]["rays_per_sec"]
            r["scaling_efficiency"] = (rays / dt) / (base * size)
        results.append(r)
        print(json.dumps(r), flush=True)
        size *= 2

    # Sharded BEAM megakernel (large-scene production path; round-4
    # verdict item 2): Morton square-row bands over tile + sample
    # windows, exercised across the same mesh sizes.
    from pathtracer_tpu.parallel.shard import render_film_sharded_beam
    import dataclasses
    import numpy as np
    from pathtracer_tpu import meshes
    cam_b, sb = meshes.sphere_in_box(10, 20)
    scene_b = sb.build()
    cam_b = dataclasses.replace(cam_b, res=(128, 128))
    beam_spp = max(8, args.spp // 8)
    rays_b = 128 * 128 * beam_spp * args.depth
    size = 1
    while size <= n:
        mesh = make_mesh(size)
        np.asarray(render_film_sharded_beam(
            mesh, cam_b, scene_b, samples=beam_spp,
            depth=args.depth).data)
        t0 = time.perf_counter()
        np.asarray(render_film_sharded_beam(
            mesh, cam_b, scene_b, samples=beam_spp,
            depth=args.depth).data)
        dt = time.perf_counter() - t0
        r = {"devices": size, "mesh": dict(mesh.shape),
             "backend": "beam_sharded",
             "rays_per_sec": rays_b / dt, "seconds": dt}
        base = next((x for x in results
                     if x.get("backend") == "beam_sharded"), None)
        if base is not None:
            r["scaling_efficiency"] = (rays_b / dt) / (
                base["rays_per_sec"] * size)
        results.append(r)
        print(json.dumps(r), flush=True)
        size *= 2
    return results


if __name__ == "__main__":
    main()
