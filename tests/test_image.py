import os

import numpy as np

from pathtracer_tpu.image import Film, psnr, read_png, write_png


def test_film_accumulate_average_gamma():
    f = Film((4, 2))  # W=4, H=2
    f += np.ones((2, 4, 3), np.float32) * 2.0
    f += np.ones((2, 4, 3), np.float32) * 2.0
    f /= 4.0
    np.testing.assert_allclose(f.data, 1.0)
    f.gamma_correct(2.2)
    np.testing.assert_allclose(f.data, 1.0)

    g = Film((1, 1), data=np.full((1, 1, 3), 0.25, np.float32))
    g.gamma_correct(2.2)
    np.testing.assert_allclose(g.data, 0.25 ** (1 / 2.2), rtol=1e-6)


def test_to_u8_flips_vertically():
    data = np.zeros((2, 1, 3), np.float32)
    data[0] = 1.0  # h=0 row is white
    f = Film((1, 2), data=data)
    u8 = f.to_u8()
    assert u8[1, 0, 0] == 255  # bottom row of the PNG (image.h:45-58)
    assert u8[0, 0, 0] == 0


def test_png_roundtrip(tmp_path, rng_np):
    img = rng_np.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    path = os.path.join(tmp_path, "t.png")
    write_png(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(img, back)


def test_ppm_write(tmp_path):
    f = Film((2, 2), data=np.full((2, 2, 3), 0.5, np.float32))
    path = os.path.join(tmp_path, "t.ppm")
    f.save_ppm(path)
    with open(path, "rb") as fh:
        blob = fh.read()
    assert blob.startswith(b"P6\n2 2\n255\n")
    assert len(blob) == len(b"P6\n2 2\n255\n") + 12


def test_reference_golden_readable():
    """Our PNG reader must open the reference golden images (fpng output)."""
    golden = "/root/reference/examples/cornell_box.png"
    if not os.path.exists(golden):
        return
    img = read_png(golden)
    assert img.shape == (1024, 1024, 3)
    assert img.mean() > 10  # not all black


def test_psnr():
    a = np.zeros((4, 4, 3))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert abs(psnr(a, b) - 20.0) < 1e-6
