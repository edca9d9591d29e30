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
honest end-to-end throughput including readback.  The TPU chip behind
the axon tunnel is SHARED: a concurrent session can halve (or, as in the
round-3 driver run, decimate) a single-run measurement.  Every metric is
therefore the MEDIAN of BENCH_REPEATS (default 5) fetch-fenced runs with
the min/max spread reported, and regressions are flagged in the output
("regression": true + "regression_notes") instead of raised — a bad run
must still emit the full record (round-3 postmortem: an assert here
destroyed the whole round's perf artifact).

Prints ONE JSON line: the headline cornell metric, with the other
workloads under "extra" (same schema per entry).
"""

import json
import os
import sys
import time

BASE_CORNELL = 5.24288e10 / 112.0   # ~4.68e8 rays/s (README.md:25-29)
BASE_SPECULAR = 5.24288e10 / 230.0  # ~2.28e8 rays/s (README.md:35-39)

# Roofline anchor: v5e TensorCore VPU peak = 8 sublanes x 128 lanes x
# 4 ALUs x 0.94 GHz.  The path-tracing hot loops are pure fp32 VPU work
# (the MXU only sees the tiny shade-table gathers), so rays/s x flops-per
# -segment / VPU_PEAK is the honest chip-utilization number; chip-level
# MFU would divide by the 197 TFLOP/s bf16 MXU peak instead and sit at
# ~1% by design (see README "MXU ablation").
VPU_PEAK_FLOPS = 8 * 128 * 4 * 0.94e9

# VECTOR-OP counts per (ray, triangle) candidate, audited against the
# kernel source round 4 (fma = 1 op, matching the 4-ALU issue model):
# Plucker secondary bounce ~44 instrs (a 3, recip 3, p/q dots 12, r 4,
# scale 3, accept chain 10, 9 winner selects), primary ~34; depth-5 mix
# ~42.  Moller-Trumbore run engine ~60 + loads (measured 75 cy/tri at
# (32,128), ROOFLINE.md §4b).  NOTE the headline kernel measures at
# 100±6% of the NOMINAL 4-ALU ceiling — vpu_util near or slightly above
# 1.0 means "at the issue roofline within op-count model error", not a
# free lunch (ROOFLINE.md §2).
FLOPS_PER_PAIR_PLUCKER = 42
FLOPS_PER_PAIR_MT = 60
FLOPS_SHADING = 160  # per segment: RNG + BRDF sample + bounce update


def _measure(render, rays, repeats=None):
    """Median of N fetch-fenced steady-state runs; returns
    (median_rays_per_sec, spread_dict)."""
    import numpy as np
    if repeats is None:
        repeats = max(1, int(os.environ.get("BENCH_REPEATS", "5")))
    film = render()
    np.asarray(film.data)  # compile + drain the async queue
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        film = render()
        np.asarray(film.data)  # fence: host fetch
        rates.append(rays / (time.perf_counter() - t0))
    rates.sort()
    n = len(rates)
    med = (rates[n // 2] if n % 2
           else 0.5 * (rates[n // 2 - 1] + rates[n // 2]))
    return med, {"runs": n, "min": rates[0], "max": rates[-1],
                 "spread": (rates[-1] - rates[0]) / med if med else 0.0}


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import dataclasses

    import pathtracer_tpu as pt
    from pathtracer_tpu import meshes

    depth = int(os.environ.get("BENCH_DEPTH", "5"))
    # spp 4096 (round 4): at 512 spp the 12.6MB film fetch over the
    # ~17MB/s tunnel was ~40% of the measured time — the metric was
    # readback-dominated, not render-dominated.  4096 spp cuts the fetch
    # share to ~9% while staying inside the bench time budget (the
    # reference's own config is 10k spp: 112 s there vs 18.9 s here,
    # measured this round = 5.9x).
    spp = int(os.environ.get("BENCH_SPP", "4096"))

    results = []
    regression_notes = []

    # 1. Diffuse Cornell (the headline).
    cam, scene = pt.cornell_box(res=(1024, 1024))
    rps, sp = _measure(
        lambda: pt.render_film(cam, scene, samples=spp, depth=depth,
                               backend="pallas"),
        1024 * 1024 * spp * depth)
    flops_seg = scene.num_tris * FLOPS_PER_PAIR_PLUCKER + FLOPS_SHADING
    results.append({
        "metric": "rays_per_sec_cornell1024", "value": rps,
        "unit": "rays/s", "vs_baseline": rps / BASE_CORNELL,
        "vpu_util": rps * flops_seg / VPU_PEAK_FLOPS, "timing": sp,
        "vpu_util_note": "1.0 = nominal 4-ALU issue ceiling; the audited "
                         "op model is ±10% and the kernel measures at "
                         "the roofline (ROOFLINE.md §2)",
    })
    # Perf-regression guard (round-2 review): the headline has been >=3x
    # baseline since round 1.  FLAG, never raise: the chip is shared and
    # a contended run must still produce the full artifact (round 3 lost
    # its entire perf record to an assert here).
    if rps / BASE_CORNELL < 3.0:
        regression_notes.append(
            f"cornell headline {rps:.3e} rays/s < 3x baseline "
            f"(steady state is ~1.9-2.7e9 at 4096 spp; spread {sp['spread']:.0%} — "
            f"suspect chip contention if spread is large)")

    # 1b. The reference's EXACT headline workload: 1024^2, 10,000 spp,
    # depth 5 (112 s on its GPU, README.md:25-29).  Median of 3 (round-4
    # verdict: this is the README's first table row; ~40 extra seconds
    # per round buys spread data on the one metric that was previously a
    # single timed run).  It is also the least contention- and readback
    # -sensitive metric in this file (fetch share ~4%).
    if os.environ.get("BENCH_REFCONFIG", "1") == "1":
        rps_ref, sp_ref = _measure(
            lambda: pt.render_film(cam, scene, samples=10000, depth=depth,
                                   backend="pallas"),
            1024 * 1024 * 10000 * depth,
            repeats=int(os.environ.get("BENCH_REFCONFIG_REPEATS", "3")))
        results.append({
            "metric": "rays_per_sec_cornell1024_refconfig_10000spp",
            "value": rps_ref, "unit": "rays/s",
            "vs_baseline": rps_ref / BASE_CORNELL,
            "seconds": 5.24288e9 * 10 / rps_ref,
            "reference_seconds": 112.0,
            "vpu_util": rps_ref * flops_seg / VPU_PEAK_FLOPS,
            "vpu_util_note": "see the cornell1024 entry", "timing": sp_ref,
        })

    # 2. Specular modified Cornell (roughness 0.05 column of the sweep).
    cam_s, scene_s = pt.modified_cornell(0.05, res=(1024, 1024))
    rps_s, sp_s = _measure(
        lambda: pt.render_film(cam_s, scene_s, samples=spp, depth=depth,
                               backend="pallas"),
        1024 * 1024 * spp * depth)
    flops_seg_s = (scene_s.num_tris * FLOPS_PER_PAIR_PLUCKER
                   + FLOPS_SHADING + 120)  # + specular rejection draws
    results.append({
        "metric": "rays_per_sec_specular1024", "value": rps_s,
        "unit": "rays/s", "vs_baseline": rps_s / BASE_SPECULAR,
        "vpu_util": rps_s * flops_seg_s / VPU_PEAK_FLOPS, "timing": sp_s,
    })

    # 3. Large scene (~10k tris) through the cluster backend.
    bres = int(os.environ.get("BENCH_BVH_RES", "256"))
    bspp = int(os.environ.get("BENCH_BVH_SPP", "256"))
    cam_b, sb = meshes.sphere_in_box(50, 100)
    scene_b = sb.build()
    cam_b = dataclasses.replace(cam_b, res=(bres, bres))
    bvh = pt.build_bvh(scene_b)
    # Headline large-scene backend: the coherent-beam megakernel.  Same
    # unbiased estimator and per-pixel noise variance as the reference's
    # sampling at equal spp; the noise is tile-correlated (blotches
    # instead of grain) -- see README "Large scenes" for the PSNR
    # equivalence measurement and ops/pallas/beam_kernel.py for why a
    # lane machine needs the coherence.  The per-pixel-independent
    # cluster backend is reported alongside.
    rps_b, sp_b = _measure(
        lambda: pt.render_film(cam_b, scene_b, samples=bspp, depth=depth,
                               backend="beam"),
        bres * bres * bspp * depth)
    results.append({
        "metric": f"rays_per_sec_bvh_{scene_b.num_tris}tris_{bres}",
        "value": rps_b, "unit": "rays/s",
        "vs_baseline": rps_b / BASE_CORNELL,
        "backend": "beam", "timing": sp_b,
        "sampling": "coherent-beam (Sadeghi 2009): unbiased per pixel, "
                    "equal per-pixel variance, tile-correlated noise",
    })
    rps_c, sp_c = _measure(
        lambda: pt.render_film(cam_b, scene_b, samples=bspp, depth=depth,
                               bvh=bvh, backend="cluster"),
        bres * bres * bspp * depth)
    results.append({
        "metric": f"rays_per_sec_bvh_cluster_{bres}",
        "value": rps_c, "unit": "rays/s",
        "vs_baseline": rps_c / BASE_CORNELL,
        "backend": "cluster", "timing": sp_c,
        "sampling": "per-pixel independent (reference discipline)",
    })
    # Roofline for the beam path: the kernel's first-class instrumented
    # launch (count_runs=True replaces film channel 0 with the emitted
    # run counter — no global-flag poking, no cache clearing; the counts
    # are exact, not riding on top of radiance).
    from pathtracer_tpu.ops.pallas import beam_kernel as _bk
    tests_seg = _bk.count_tri_tests(cam_b, scene_b, samples=8, depth=depth)
    results[-2]["tri_tests_per_segment"] = tests_seg
    results[-2]["vpu_util"] = (rps_b * (tests_seg * FLOPS_PER_PAIR_MT
                                        + FLOPS_SHADING) / VPU_PEAK_FLOPS)

    # 3b. ~100k-triangle stress scene (BASELINE config 4's upper end;
    # the reference GPU path is capped at 300 uniform triangles and its
    # CPU path is single-threaded).  Unbounded cluster count via the
    # beam kernel's positional bit-plane chunks.
    # 64 spp (round 5): each render call pays ~150 ms fixed (tunnel
    # dispatch + film fetch); at 32 spp that was ~15% of the metric
    gspp = int(os.environ.get("BENCH_GARDEN_SPP", "64"))
    cam_g, gsb = meshes.mesh_garden()
    scene_g = gsb.build()
    cam_g = dataclasses.replace(cam_g, res=(bres, bres))
    rps_g, sp_g = _measure(
        lambda: pt.render_film(cam_g, scene_g, samples=gspp, depth=depth,
                               backend="beam"),
        bres * bres * gspp * depth)
    tests_g = _bk.count_tri_tests(cam_g, scene_g, samples=4, depth=depth)
    results.append({
        "metric": f"rays_per_sec_garden_{scene_g.num_tris}tris_{bres}",
        "value": rps_g, "unit": "rays/s",
        "vs_baseline": rps_g / BASE_CORNELL,
        "backend": "beam", "timing": sp_g,
        "tri_tests_per_segment": tests_g,
        "vpu_util": rps_g * (tests_g * FLOPS_PER_PAIR_MT
                             + FLOPS_SHADING) / VPU_PEAK_FLOPS,
    })

    # 4. Wavefront pipeline vs megakernel (round-2 review item 2): the
    # re-architecture claim is settled by measurement — see
    # ops/wavefront.py "MEASURED VERDICT" for the analysis.
    cam_w, scene_w = pt.cornell_box(res=(512, 512))
    for wdepth in (5, 16):
        rays_w = 512 * 512 * 64 * wdepth
        rps_w, _spw = _measure(
            lambda d=wdepth: pt.render_film(cam_w, scene_w, samples=64,
                                            depth=d, backend="wavefront"),
            rays_w)
        rps_m, _spm = _measure(
            lambda d=wdepth: pt.render_film(cam_w, scene_w, samples=64,
                                            depth=d, backend="pallas"),
            rays_w)
        results.append({
            "metric": f"rays_per_sec_wavefront_512_d{wdepth}",
            "value": rps_w, "unit": "rays/s",
            "vs_baseline": rps_w / BASE_CORNELL,
            "megakernel_same_config": rps_m,
            "note": "wavefront never wins on TPU; auto never selects it "
                    "(ops/wavefront.py MEASURED VERDICT)",
        })

    head = dict(results[0])
    head["extra"] = results[1:]
    head["regression"] = bool(regression_notes)
    if regression_notes:
        head["regression_notes"] = regression_notes
    print(json.dumps(head))


if __name__ == "__main__":
    main()
