"""Framebuffer + PPM image I/O.

Reference: ``/root/reference/raytracer/src/image.rs`` — an RGBA8 framebuffer
with ``[row, col]`` indexing (image.rs:8-36) and an ASCII PPM (P3) writer that
drops alpha and writes one RGB triplet per line (image.rs:59-81).

Here the framebuffer is simply a numpy ``[H, W, 4] uint8`` array; the writer
produces byte-identical P3 output to the reference (same header, same
"r g b\\n" lines) and a reader is added for golden-image tests.
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np


def new_framebuffer(width: int, height: int) -> np.ndarray:
    """Framebuffer::new (image.rs:16-20): zero-initialized RGBA8."""
    return np.zeros((height, width, 4), np.uint8)


def write_ppm(framebuffer: np.ndarray, path: Optional[str] = None) -> None:
    """write_image (image.rs:59-81): ASCII P3, alpha dropped, one triplet per
    line.  ``path=None`` writes to stdout like the reference's ``None`` arm.

    File output goes through the native C writer when available (byte-equal
    by construction — cross-checked in tests/test_native.py); the Python
    fallback formats with C-level numpy string ops, not a per-pixel loop."""
    fb = np.asarray(framebuffer)
    assert fb.ndim == 3 and fb.shape[2] in (3, 4) and fb.dtype == np.uint8
    height, width = fb.shape[:2]
    if path is not None:
        try:
            from . import native
            if fb.shape[2] == 3:
                a = np.full((height, width, 1), 255, np.uint8)
                fb = np.concatenate([fb, a], axis=-1)
            native.write_ppm_native(fb, path)
            return
        except Exception:
            pass  # no compiler / no .so: fall through to pure Python
    flat = fb[:, :, :3].reshape(-1, 3)
    dec = np.char.mod("%d", flat)  # elementwise decimal, vectorized
    rows = np.char.add(np.char.add(
        np.char.add(dec[:, 0], " "), np.char.add(dec[:, 1], " ")), dec[:, 2])
    data = (f"P3\n{width} {height}\n255\n"
            + "\n".join(rows.tolist()) + "\n")
    if path is None:
        sys.stdout.write(data)
    else:
        with open(path, "w") as f:
            f.write(data)


def read_ppm(path: str) -> np.ndarray:
    """Read an ASCII P3 PPM back into an RGBA8 [H, W, 4] array (alpha=255)."""
    with open(path, "r") as f:
        tokens = []
        for line in f:
            hash_idx = line.find("#")
            if hash_idx >= 0:
                line = line[:hash_idx]
            tokens.extend(line.split())
    if not tokens or tokens[0] != "P3":
        raise ValueError(f"not an ASCII PPM (P3) file: {path}")
    width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"unsupported max color value {maxval}")
    vals = np.array(tokens[4:4 + width * height * 3], np.uint8)
    rgb = vals.reshape(height, width, 3)
    a = np.full((height, width, 1), 255, np.uint8)
    return np.concatenate([rgb, a], axis=-1)


def png_bytes(framebuffer: np.ndarray) -> bytes:
    """Minimal dependency-free PNG encoder (RGBA8) -> bytes."""
    import struct
    import zlib

    fb = np.asarray(framebuffer)
    if fb.dtype != np.uint8:   # accept [0,1] float images for quick viewing
        fb = (np.clip(fb, 0.0, 1.0) * 255.999).astype(np.uint8)
    if fb.shape[2] == 3:
        a = np.full(fb.shape[:2] + (1,), 255, np.uint8)
        fb = np.concatenate([fb, a], axis=-1)
    height, width = fb.shape[:2]
    raw = b"".join(b"\x00" + fb[r].tobytes() for r in range(height))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def write_png(framebuffer: np.ndarray, path: str) -> None:
    """Minimal dependency-free PNG writer (RGBA8), for quick viewing."""
    with open(path, "wb") as f:
        f.write(png_bytes(framebuffer))
