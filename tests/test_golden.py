"""Golden-image regression: renders must stay radiometrically and
structurally anchored to the reference's checked-in PNGs
(examples/cornell_box.png etc.).  Full-resolution matched-spp PSNR runs on
TPU (see README numbers); here a low-res statistical anchor keeps CI fast."""

import os

import numpy as np
import pytest

import pathtracer_tpu as pt

GOLDEN = "/root/reference/examples/cornell_box.png"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no reference golden")
def test_cornell_matches_golden_statistics():
    res = 64
    cam, scene = pt.cornell_box(res=(res, res))
    film = pt.render_film(cam, scene, samples=128, depth=5, seed=11)
    # film rows are bottom-up (image.h convention); PNGs are top-down
    ours_lin = np.asarray(film.data)[::-1]

    ref = pt.read_png(GOLDEN).astype(np.float32) / 255.0
    k = 1024 // res
    # linearize BEFORE downsampling (gamma is concave; the other order is
    # Jensen-biased dark)
    ref_lin = (ref ** 2.2).reshape(res, k, res, k, 3).mean((1, 3))
    ref_small = ref.reshape(res, k, res, k, 3).mean((1, 3))

    # Linear radiance agreement (unbiased estimator => tight)
    assert abs(ours_lin.mean() - ref_lin.mean()) / ref_lin.mean() < 0.05

    # Structural agreement in gamma space after clamping.  At 128 spp the
    # gamma-space comparison is dominated by our own Monte-Carlo noise
    # (~18 dB here; the matched-10k-spp full-res comparison on TPU reaches
    # ~40 dB, the independent-render noise floor) — this is a regression
    # anchor, not the parity statement.
    ours_g = np.clip(ours_lin, 0, 1) ** (1 / 2.2)
    p = pt.psnr(ours_g, ref_small)
    assert p > 15.0, f"PSNR vs golden dropped to {p:.2f} dB"

    # The brightest region (the light) is in the same place
    oy, ox = np.unravel_index(np.argmax(ours_g.sum(-1)), (res, res))
    ry, rx = np.unravel_index(np.argmax(ref_small.sum(-1)), (res, res))
    assert abs(int(oy) - int(ry)) <= 2 and abs(int(ox) - int(rx)) <= 2
