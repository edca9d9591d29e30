#!/usr/bin/env python
"""Headline benchmark: Cornell box rays/s on one TPU chip.

Reference baseline (BASELINE.md): 1024x1024, 10,000 spp, depth 5 in 112 s on
an unspecified OpenGL GPU => ~4.68e8 ray segments / second.

We render the identical scene/camera/depth at the same resolution and
measure steady-state ray-segment throughput (rays = W*H*spp*depth), using
enough samples to amortize dispatch but not the full 10k spp (throughput is
spp-invariant by construction — each sample batch is an identical program).

Prints ONE JSON line:
  {"metric": "rays_per_sec_cornell1024", "value": ..., "unit": "rays/s",
   "vs_baseline": ...}
"""

import json
import os
import sys
import time

BASELINE_RAYS_PER_SEC = 5.24288e10 / 112.0  # ~4.68e8 (README.md:25-29)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import pathtracer_tpu as pt

    res = int(os.environ.get("BENCH_RES", "1024"))
    depth = int(os.environ.get("BENCH_DEPTH", "5"))
    warm_spp = int(os.environ.get("BENCH_WARM_SPP", "32"))
    spp = int(os.environ.get("BENCH_SPP", "512"))
    backend = os.environ.get("BENCH_BACKEND", "pallas")

    cam, scene = pt.cornell_box(res=(res, res))

    try:
        # warmup / compile
        pt.render_film(cam, scene, samples=warm_spp, depth=depth,
                       backend=backend)
    except Exception as e:  # pallas unavailable -> XLA path
        print(f"warmup failed on backend={backend}: {e}", file=sys.stderr)
        backend = "brute"
        pt.render_film(cam, scene, samples=warm_spp, depth=depth,
                       backend=backend)

    t0 = time.perf_counter()
    pt.render_film(cam, scene, samples=spp, depth=depth, backend=backend)
    dt = time.perf_counter() - t0

    rays = res * res * spp * depth
    rps = rays / dt
    print(json.dumps({
        "metric": "rays_per_sec_cornell1024",
        "value": rps,
        "unit": "rays/s",
        "vs_baseline": rps / BASELINE_RAYS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
