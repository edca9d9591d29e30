"""Film / image output (L3b), port of ``/root/reference/pathtracer/image.h``.

The film is a plain ``(H, W, 3)`` float32 array (device-side during
rendering, numpy on the host for I/O) instead of the reference's
vector-of-vectors of vec3.  Accumulation, sample averaging, gamma correction
and 8-bit conversion match image.h:32-62 — including the vertical flip on
save, so our PNGs are pixel-aligned with the reference golden images.

PNG encoding replaces the vendored fpng (fpng.cc) with, in preference
order: the native C++ encoder in ``native/`` (ctypes), else a stdlib
zlib-based encoder (always available; PNG filter 0 + one IDAT).
"""

from __future__ import annotations

import struct
import zlib

import jax.numpy as jnp
import numpy as np


class Film:
    """Accumulating film. Mirrors Image (image.h:9-75)."""

    def __init__(self, res, data=None):
        self.width, self.height = int(res[0]), int(res[1])
        if data is None:
            data = np.zeros((self.height, self.width, 3), np.float32)
        self.data = data  # (H, W, 3), row h=0 at the image BOTTOM (as ref)

    def __iadd__(self, other):
        self.data = self.data + (other.data if isinstance(other, Film) else other)
        return self

    def __itruediv__(self, scalar):
        self.data = self.data / scalar
        return self

    def gamma_correct(self, gamma: float = 2.2) -> "Film":
        """pixels = pixels ** (1/gamma) (image.h:41-44)."""
        self.data = np.power(np.maximum(np.asarray(self.data), 0.0),
                             1.0 / gamma)
        return self

    def to_u8(self) -> np.ndarray:
        """Clamp to [0,1], scale to u8, flip vertically (image.h:45-58)."""
        d = np.asarray(self.data)
        d = np.clip(d, 0.0, 1.0)
        u8 = (d * 255.0).astype(np.uint8)
        return u8[::-1]  # h=0 (bottom) goes to the last PNG row

    def save_png(self, filename: str) -> None:
        write_png(filename, self.to_u8())

    def save_ppm(self, filename: str) -> None:
        """Binary P6 PPM (image.h:63-74)."""
        u8 = self.to_u8()
        with open(filename, "wb") as f:
            f.write(f"P6\n{self.width} {self.height}\n255\n".encode())
            f.write(u8.tobytes())


def write_png(filename: str, rgb_u8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as PNG.

    Tries the native C++ encoder first (the fpng analog), falls back to a
    minimal stdlib implementation (8-bit RGB, filter 0, single IDAT)."""
    try:
        from .utils import native as _native
        if _native.write_png(filename, rgb_u8):
            return
    except Exception:
        pass
    h, w, _ = rgb_u8.shape
    raw = b"".join(b"\x00" + rgb_u8[i].tobytes() for i in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        out = struct.pack(">I", len(payload)) + tag + payload
        return out + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(filename, "wb") as f:
        f.write(png)


def read_png(filename: str) -> np.ndarray:
    """Minimal PNG reader for golden-image tests (8-bit RGB/RGBA, filters
    0-4). Returns (H, W, 3) uint8."""
    with open(filename, "rb") as f:
        blob = f.read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = None
    bit_depth = color_type = None
    idat = b""
    while pos < len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    assert bit_depth == 8, f"unsupported bit depth {bit_depth}"
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = w * nch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for row in range(h):
        flt = raw[p]
        line = np.frombuffer(raw[p + 1 : p + 1 + stride], np.uint8).astype(np.int32)
        p += 1 + stride
        cur = np.zeros(stride, np.int32)
        if flt == 0:
            cur = line
        elif flt == 2:  # up
            cur = (line + prev) & 0xFF
        else:  # sub/average/paeth need the scanline left-neighbour loop
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                if flt == 1:
                    pred = a
                elif flt == 3:
                    pred = (a + b) // 2
                elif flt == 4:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad filter {flt}")
                cur[i] = (line[i] + pred) & 0xFF
        out[row] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=-1)
    return img[..., :3]


def psnr(a, b, peak: float = 1.0) -> float:
    """Peak signal-to-noise ratio between two images (any float arrays)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
