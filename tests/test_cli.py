"""CLI smoke tests (the reference's 'CLI' is recompile-the-scene,
examples/cornell_box.cc:5-9; this framework ships a real argparse CLI —
SURVEY.md §5 config/flags).  Run in-process on the CPU backend."""

import numpy as np

from pathtracer_tpu import cli
from pathtracer_tpu.image import read_png


def test_cli_render(tmp_path, capsys):
    out = tmp_path / "corner.png"
    cli.main(["render", "corner", str(out), "--res", "32", "--spp", "4",
              "--depth", "2", "--backend", "brute"])
    img = read_png(str(out))
    assert img.shape == (32, 32, 3)
    assert img.max() > 0  # the emitter must be visible


def test_cli_render_camera_spec(tmp_path):
    out = tmp_path / "cam.png"
    cli.main(["render", "corner", str(out), "--res", "16", "--spp", "2",
              "--depth", "1", "--backend", "brute",
              "--camera", "0,0,-6:0,0,1"])
    assert read_png(str(out)).shape == (16, 16, 3)


def test_cli_invert(capsys):
    cli.main(["invert", "corner", "--res", "12", "--spp", "4",
              "--depth", "2", "--steps", "3", "--target-spp", "8"])
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    assert "albedo error" in tail
    err = float(tail.rsplit(" ", 1)[-1])
    assert np.isfinite(err)


def test_cli_realtime_scripted(tmp_path, capsys):
    cli.main(["realtime", "corner", str(tmp_path), "--res", "16",
              "--frames", "3", "--frame-samples", "1", "--depth", "1",
              "--keys", "w,,p"])
    # 'p' on the last frame writes a screenshot into the directory
    shots = list(tmp_path.glob("*.png"))
    assert shots, "screenshot key produced no file"
