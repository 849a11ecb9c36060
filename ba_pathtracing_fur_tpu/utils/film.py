"""Film: accumulation helpers + image I/O.

Replaces the reference's Texture::saveTo PNG snapshot path
(/root/reference/src/libraries/KIRK/Common/Texture.h:25-90,
Demo/main.cpp:129-141) with a dependency-light PNG writer (pure zlib) and a
PPM fallback.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_srgb_u8(img: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    img = np.asarray(img, np.float32)
    img = np.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    return (img * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray, gamma: float = 2.2) -> None:
    """Write [H,W,3] float (linear) or uint8 image as PNG."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = to_srgb_u8(a, gamma)
    h, w = a.shape[:2]
    if a.ndim == 2:
        a = a[..., None].repeat(3, axis=-1)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_ppm(path: str, img: np.ndarray, gamma: float = 2.2) -> None:
    a = to_srgb_u8(img, gamma)
    h, w = a.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(a.tobytes())


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def relative_l1(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sum(np.abs(a - b)) / np.maximum(np.sum(np.abs(b)), 1e-12))
