#!/usr/bin/env python
"""Inverse-rendering recovery benchmark (BASELINE config 5) — the
framework's flagship addition over the reference (which has no
differentiable path at all).

Five workloads, all on one TPU chip:
  * cornell  — recover every visible diffuse albedo AND the light's
    emission of the Cornell box from a clean rendered target.
    Acceptance: mean abs albedo error over VISIBLE diffuse triangles
    < 0.05 (round-4 bar; round 3 plateaued at 0.36).
  * sphere   — the 9.8k-triangle sphere-in-box scene through the Pallas
    cluster backend.  Acceptance: visible-diffuse error < 0.1.
  * rough    — recover the specular walls' roughness of the modified
    Cornell (true 0.3, grey 0.5 start) via common-random-number SPSA
    (the pathwise roughness gradient is boundary-dominated and measured
    wrong-signed, diff.py).  Acceptance: mean error < 0.1.
  * joint    — albedo + emission + roughness recovered TOGETHER from
    grey starts on the modified Cornell (round-4 verdict item 5: the
    honest flagship configuration).  Acceptance: visible-albedo < 0.1
    AND pixel-weighted roughness < 0.15.
  * garden   — the 105k-triangle scene through the UNROLLED cluster
    differentiable path (round-4 verdict item 4: the 30k scoped-vmem
    ceiling is gone).  Reports measured seconds/step and a finite
    -difference gradcheck through the new path.

Method notes (see inverse.py for the full story): the optimizer uses the
PAIRED unbiased squared-error surrogate — losses nonlinear in the noisy
film estimate carry a Var(film) penalty that systematically darkens the
recovery — with relative weighting, material-type update masks (emission
only on EMIT surfaces), and cosine lr decay.  Targets are rendered at
high spp by the production kernels (pallas megakernel / beam), then the
recovery trains against them with the brute/cluster differentiable path.

Prints ONE JSON line; writes INVERT_r05.json when run from the repo root.
"""

import json
import os
import time


def _visible_diffuse_mask(cam, scene, res):
    import jax
    import numpy as np
    import jax.numpy as jnp
    import pathtracer_tpu.materials as m
    from pathtracer_tpu.ops import intersect as isect
    from pathtracer_tpu.camera import get_rays
    from pathtracer_tpu import rng as prng

    w = jax.lax.broadcasted_iota(jnp.int32, (res, res), 1)
    h = jax.lax.broadcasted_iota(jnp.int32, (res, res), 0)
    st = prng.sample_seed(w[None], h[None], res,
                          jnp.zeros((1, 1, 1), jnp.int32), 1)
    st, u1 = prng.rand01(st)
    st, u2 = prng.rand01(st)
    ro, rd = get_rays(cam, w[None], h[None], u1, u2)
    if scene.num_tris > 20_000:
        # dense brute materializes rays x tris floats (~GBs at 105k:
        # the round-5 garden workload OOMed here); use the packet BVH
        from pathtracer_tpu.bvh import build_bvh
        bvh = build_bvh(scene)
        _, tid = isect.intersect_bvh_packet(
            ro.reshape(-1, 3), rd.reshape(-1, 3), bvh, scene.v1,
            scene.v2, scene.v3, max_leaf=bvh.max_leaf,
            stack_size=bvh.stack_size())
    else:
        _, tid = isect.intersect_brute(
            ro.reshape(-1, 3), rd.reshape(-1, 3),
            scene.v1, scene.v2, scene.v3)
    tid = np.asarray(tid)
    counts = np.bincount(tid[tid >= 0], minlength=scene.num_tris)
    mtype = scene.host_materials()[0]
    frac = max(1, (res * res) // 1000)
    return (counts >= frac) & (np.asarray(mtype) == m.DIFFUSE), counts


def _pixel_weighted_err(alb, alb_true, counts, mtype):
    """Mean abs albedo error weighted by primary-hit pixel counts: the
    error of what the camera actually SEES.  At 9.8k triangles on a 64^2
    film most triangles cover 0-3 pixels, so a per-triangle mean is
    dominated by barely-constrained rows; pixel weighting asks the
    operative question (is the visible scene's recovered albedo right?)
    without any visibility threshold to game."""
    import numpy as np
    import pathtracer_tpu.materials as m
    w = counts * (np.asarray(mtype) == m.DIFFUSE)
    e = np.abs(alb - alb_true).mean(axis=1)
    return float((e * w).sum() / max(w.sum(), 1))


def _save(results):
    """Crash-proof artifact: rewrite INVERT_r05.json after EVERY
    workload (the round-5 first run lost the sphere/rough results to a
    workload-5 OOM because only workload 1 had been saved)."""
    if os.path.exists("bench_invert.py"):
        with open("INVERT_r05.json", "w") as f:
            json.dump({"workloads": results}, f, indent=1)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import dataclasses

    import numpy as np
    import jax.numpy as jnp
    import pathtracer_tpu as pt
    from pathtracer_tpu import diff, inverse, meshes

    results = []

    # --- 1. Cornell box (the flagship recovery) -----------------------
    RES, DEPTH = 128, 5
    steps = int(os.environ.get("INVERT_STEPS", "1000"))
    spp = int(os.environ.get("INVERT_SPP", "384"))
    cam, scene = pt.cornell_box(res=(RES, RES))
    target = jnp.asarray(np.asarray(pt.render_film(
        cam, scene, samples=32768, depth=DEPTH, backend="pallas").data))
    vis, _ = _visible_diffuse_mask(cam, scene, RES)

    # Segmented warm restarts (Adam state reset per segment, spp ramp):
    # measured better than one long cosine run on this problem (0.030 vs
    # 0.075 visible error at the same total step count).
    t0 = time.perf_counter()
    p0 = None
    losses = []
    seg_steps = max(steps // 4, 1)
    for seg_spp in (spp // 2, spp // 2, spp, spp):
        mats, ls = inverse.recover_materials(
            cam, scene, target, steps=seg_steps, samples=seg_spp,
            depth=DEPTH, lr=0.08, backend="brute", params0=p0,
            optimize=("albedo", "emit"), verbose=False)
        p0 = inverse.to_unconstrained(mats)
        losses.extend(ls.tolist())
    wall = time.perf_counter() - t0
    mtype, alb_true, emit_true, _ = scene.host_materials()
    alb = np.asarray(mats["albedo"])[: scene.num_tris]
    err_vis = float(np.abs(alb - alb_true)[vis].mean())
    emit_rec = np.asarray(mats["emit"])[: scene.num_tris]
    import pathtracer_tpu.materials as m
    emit_err = float(np.abs(
        emit_rec[np.asarray(mtype) == m.EMIT]
        - emit_true[np.asarray(mtype) == m.EMIT]).mean())
    results.append({
        "metric": "invert_cornell_visible_albedo_err", "value": err_vis,
        "unit": "mean_abs_error", "recovered": err_vis < 0.05,
        "emit_err": emit_err, "res": RES, "spp": spp, "depth": DEPTH,
        "steps": steps, "seconds_per_step": wall / steps,
        "loss_first": float(losses[0]), "loss_last": float(losses[-1]),
        "visible_diffuse_tris": int(vis.sum()),
    })
    print(json.dumps(results[-1]), flush=True)
    _save(results)

    # --- 2. 9.8k-tri sphere scene via the cluster backend -------------
    RES2, DEPTH2 = 64, 4
    steps2 = int(os.environ.get("INVERT_SPHERE_STEPS", "1200"))
    # spp 24 passes the bar in ~the same wall budget as round 4.  (The
    # old "spp 64 OOMs at 9.6G" limit was the one-hot gather backward
    # materializing a rays x tris matrix — gone since round 5, so spp
    # can now be raised if a tighter recovery is ever needed.)
    spp2 = int(os.environ.get("INVERT_SPHERE_SPP", "24"))
    cam2, sb = meshes.sphere_in_box(50, 100)
    scene2 = sb.build()
    cam2 = dataclasses.replace(cam2, res=(RES2, RES2))
    target2 = jnp.asarray(np.asarray(pt.render_film(
        cam2, scene2, samples=16384, depth=DEPTH2, backend="beam").data))
    _, counts2 = _visible_diffuse_mask(cam2, scene2, RES2)

    t0 = time.perf_counter()
    p0 = None
    losses2 = []
    for _seg in range(4):
        mats2, ls2 = inverse.recover_materials(
            cam2, scene2, target2, steps=steps2 // 4, samples=spp2,
            depth=DEPTH2, lr=0.08, backend="cluster", params0=p0,
            optimize=("albedo", "emit"), verbose=False)
        p0 = inverse.to_unconstrained(mats2)
        losses2.extend(ls2.tolist())
    wall2 = time.perf_counter() - t0
    mtype2, alb_true2, _, _ = scene2.host_materials()
    alb2 = np.asarray(mats2["albedo"])[: scene2.num_tris]
    err_vis2 = _pixel_weighted_err(alb2, alb_true2, counts2, mtype2)
    results.append({
        "metric": "invert_sphere9812_pixel_weighted_albedo_err",
        "value": err_vis2, "unit": "mean_abs_error",
        "recovered": err_vis2 < 0.1, "tris": int(scene2.num_tris),
        "res": RES2, "spp": spp2, "depth": DEPTH2, "steps": steps2,
        "seconds_per_step": wall2 / steps2, "backend": "cluster",
        "loss_first": float(losses2[0]), "loss_last": float(losses2[-1]),
    })
    print(json.dumps(results[-1]), flush=True)
    _save(results)

    # --- 3. roughness recovery on the specular modified Cornell -------
    RES3, DEPTH3 = 64, 5
    steps3 = int(os.environ.get("INVERT_ROUGH_STEPS", "400"))
    spp3 = int(os.environ.get("INVERT_ROUGH_SPP", "128"))
    cam3, scene3 = pt.modified_cornell(0.3, res=(RES3, RES3))
    target3 = jnp.asarray(np.asarray(pt.render_film(
        cam3, scene3, samples=16384, depth=DEPTH3,
        backend="pallas").data))
    true_p = inverse.to_unconstrained(diff.material_params(scene3))
    p0 = inverse.init_params(scene3)
    p0["albedo"] = true_p["albedo"]
    p0["emit"] = true_p["emit"]
    t0 = time.perf_counter()
    mats3, losses3 = inverse.recover_materials(
        cam3, scene3, target3, steps=steps3, samples=spp3, depth=DEPTH3,
        lr=0.08, lr_end=4e-3, params0=p0, backend="brute",
        optimize=("roughness",), verbose=False)
    wall3 = time.perf_counter() - t0
    mtype3, _, _, rough_true3 = scene3.host_materials()
    spec3 = np.asarray(mtype3) == m.SPECULAR
    _, counts3 = _visible_diffuse_mask(cam3, scene3, RES3)
    r3 = np.asarray(mats3["roughness"])[: scene3.num_tris]
    e3 = np.abs(r3 - np.asarray(rough_true3))
    w3 = counts3 * spec3
    err3 = float((e3 * w3).sum() / max(w3.sum(), 1))
    results.append({
        "metric": "invert_roughness_spsa_pixel_weighted_err",
        "value": err3,
        "unit": "mean_abs_error", "recovered": err3 < 0.1,
        "true_roughness": 0.3, "start": 0.5,
        "res": RES3, "spp": spp3, "depth": DEPTH3, "steps": steps3,
        "seconds_per_step": wall3 / steps3,
        "loss_first": float(losses3[0]), "loss_last": float(losses3[-1]),
    })
    print(json.dumps(results[-1]), flush=True)
    _save(results)

    # --- 4. JOINT albedo + emission + roughness (round-4 verdict 5) ----
    # The honest flagship configuration: every parameter group moves at
    # once from grey starts; albedo/emission via the paired unbiased
    # loss, roughness via common-random-number SPSA, type masks keeping
    # the degeneracies structural (inverse.py).
    RES4, DEPTH4 = 64, 5
    steps4 = int(os.environ.get("INVERT_JOINT_STEPS", "800"))
    spp4 = int(os.environ.get("INVERT_JOINT_SPP", "192"))
    cam4, scene4 = pt.modified_cornell(0.3, res=(RES4, RES4))
    target4 = jnp.asarray(np.asarray(pt.render_film(
        cam4, scene4, samples=32768, depth=DEPTH4,
        backend="pallas").data))
    t0 = time.perf_counter()
    p0 = None
    losses4 = []
    seg4 = max(steps4 // 4, 1)
    for seg_spp in (spp4 // 2, spp4 // 2, spp4, spp4):
        mats4, ls4 = inverse.recover_materials(
            cam4, scene4, target4, steps=seg4, samples=seg_spp,
            depth=DEPTH4, lr=0.08, lr_end=4e-3, backend="brute",
            params0=p0, optimize=("albedo", "emit", "roughness"),
            verbose=False)
        p0 = inverse.to_unconstrained(mats4)
        losses4.extend(ls4.tolist())
    wall4 = time.perf_counter() - t0
    mtype4, alb_true4, emit_true4, rough_true4 = scene4.host_materials()
    _, counts4 = _visible_diffuse_mask(cam4, scene4, RES4)
    alb4 = np.asarray(mats4["albedo"])[: scene4.num_tris]
    # visible-surface albedo error over NON-EMIT rows (specular walls'
    # albedo is live here too), pixel-weighted like workload 2
    w_alb = counts4 * (np.asarray(mtype4) != m.EMIT)
    e_alb = np.abs(alb4 - alb_true4).mean(axis=1)
    err4_alb = float((e_alb * w_alb).sum() / max(w_alb.sum(), 1))
    r4 = np.asarray(mats4["roughness"])[: scene4.num_tris]
    w_r = counts4 * (np.asarray(mtype4) == m.SPECULAR)
    err4_rough = float((np.abs(r4 - np.asarray(rough_true4)) * w_r).sum()
                       / max(w_r.sum(), 1))
    emit4 = np.asarray(mats4["emit"])[: scene4.num_tris]
    err4_emit = float(np.abs(
        emit4[np.asarray(mtype4) == m.EMIT]
        - emit_true4[np.asarray(mtype4) == m.EMIT]).mean())
    results.append({
        "metric": "invert_joint_albedo_emit_roughness",
        "value": err4_alb, "unit": "mean_abs_error",
        "albedo_err_pixel_weighted": err4_alb,
        "roughness_err_pixel_weighted": err4_rough,
        "emit_err": err4_emit,
        "recovered": err4_alb < 0.1 and err4_rough < 0.15,
        "bars": {"albedo": 0.1, "roughness": 0.15},
        "res": RES4, "spp": spp4, "depth": DEPTH4, "steps": steps4,
        "seconds_per_step": wall4 / steps4,
        "loss_first": float(losses4[0]), "loss_last": float(losses4[-1]),
    })
    print(json.dumps(results[-1]), flush=True)
    _save(results)

    # --- 5. 105k-tri garden through the UNROLLED cluster diff path -----
    # Round-4 verdict item 4: the differentiable path no longer stops at
    # the 30k scoped-vmem ceiling (trace_rays unroll, diff.py).  Measures
    # a real recovery (visible albedo from a beam-rendered target) plus a
    # finite-difference gradcheck THROUGH the 105k cluster kernel.
    RES5, DEPTH5 = 64, 4
    steps5 = int(os.environ.get("INVERT_GARDEN_STEPS", "300"))
    spp5 = int(os.environ.get("INVERT_GARDEN_SPP", "8"))
    cam5, gsb5 = meshes.mesh_garden()
    scene5 = gsb5.build()
    cam5 = dataclasses.replace(cam5, res=(RES5, RES5))
    target5 = jnp.asarray(np.asarray(pt.render_film(
        cam5, scene5, samples=8192, depth=DEPTH5, backend="beam").data))
    _, counts5 = _visible_diffuse_mask(cam5, scene5, RES5)

    accel5 = diff.make_accel(scene5, "cluster")
    gc_loss = diff.make_loss(cam5, scene5, target5, samples=2,
                             depth=3, backend="cluster")
    import jax as _jax
    _, g5 = _jax.value_and_grad(gc_loss)(diff.material_params(scene5))
    # probe the largest-gradient albedo coordinates: a near-zero
    # coordinate's FD signal is below the f32 resolution of the loss
    ga5 = np.abs(np.asarray(g5["albedo"])).ravel()
    probe = [("albedo", int(i)) for i in np.argsort(ga5)[-2:]]
    gc_abs, gc_rel = diff.gradcheck(
        gc_loss, diff.material_params(scene5), eps=2e-2, indices=probe,
        mode="one_sided")

    t0 = time.perf_counter()
    mats5, losses5 = inverse.recover_materials(
        cam5, scene5, target5, steps=steps5, samples=spp5, depth=DEPTH5,
        lr=0.08, lr_end=8e-3, backend="cluster",
        optimize=("albedo",), verbose=False)
    wall5 = time.perf_counter() - t0
    mtype5, alb_true5, _, _ = scene5.host_materials()
    alb5 = np.asarray(mats5["albedo"])[: scene5.num_tris]
    err5 = _pixel_weighted_err(alb5, alb_true5, counts5, mtype5)
    results.append({
        "metric": "invert_garden105k_pixel_weighted_albedo_err",
        "value": err5, "unit": "mean_abs_error",
        "recovered": err5 < 0.15, "tris": int(scene5.num_tris),
        "res": RES5, "spp": spp5, "depth": DEPTH5, "steps": steps5,
        "seconds_per_step": wall5 / steps5, "backend": "cluster",
        "gradcheck_rel_err": gc_rel, "gradcheck_ok": gc_rel < 0.05,
        "loss_first": float(losses5[0]), "loss_last": float(losses5[-1]),
    })
    print(json.dumps(results[-1]), flush=True)

    head = dict(results[0])
    head["extra"] = results[1:]
    print(json.dumps(head))
    _save(results)


if __name__ == "__main__":
    main()
