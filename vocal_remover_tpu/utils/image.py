"""Image write helpers (reference lib/utils.py imwrite, cv2-based).

cv2 is not available here; PIL is. Falls back to a pure-stdlib PNG
encoder if PIL is ever missing, swapping the extension to .png.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

try:
    from PIL import Image

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False


def _write_png(path: str, img: np.ndarray):
    """Minimal PNG writer for uint8 grayscale/RGB/RGBA (H, W[, C])."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        data = img[:, :, None]
    else:
        channels = img.shape[2]
        color_type = {1: 0, 3: 2, 4: 6}[channels]
        data = img
    h, w = img.shape[:2]
    raw = b"".join(
        b"\x00" + data[y].tobytes() for y in range(h)
    )

    def chunk(tag, payload):
        c = tag + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def imwrite(path: str, img: np.ndarray) -> bool:
    """Write a uint8 image. Note: the reference produces BGR-ordered
    images via cv2; our spectrogram images are grayscale/stacked
    channels, where order is irrelevant."""
    try:
        if _HAVE_PIL:
            Image.fromarray(np.asarray(img, np.uint8)).save(path)
        else:
            base, ext = os.path.splitext(path)
            _write_png(base + ".png", img)
        return True
    except Exception as e:  # mirror reference's soft-fail (lib/utils.py:28-30)
        print(e)
        return False


def imread(path: str):
    try:
        if _HAVE_PIL:
            return np.asarray(Image.open(path))
        raise RuntimeError("PIL unavailable")
    except Exception as e:
        print(e)
        return None
