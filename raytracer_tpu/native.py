"""ctypes bindings to the native C++ runtime (native/libraytracer_tpu.so).

The native library is the embedding layer for C/C++/Swift hosts — the analog
of the reference's Rust staticlib behind its cbindgen C ABI (lib.rs:38-63).
From Python it serves as (a) a CPU render engine whose parity mode is
bit-identical to the oracle, and (b) a fast native PPM writer.

Build it with ``make -C native`` (see native/Makefile); ``load_library``
will also attempt that automatically if the .so is missing and a compiler
is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libraytracer_tpu.so")

_lib = None


class RtColorU8(ctypes.Structure):
    _fields_ = [("r", ctypes.c_uint8), ("g", ctypes.c_uint8),
                ("b", ctypes.c_uint8), ("a", ctypes.c_uint8)]


class RtFramebuffer(ctypes.Structure):
    _fields_ = [("width", ctypes.c_size_t), ("height", ctypes.c_size_t),
                ("pixels", ctypes.POINTER(RtColorU8))]


class RtRenderOptions(ctypes.Structure):
    _fields_ = [("samples_per_pixel", ctypes.c_int32),
                ("max_ray_bounces", ctypes.c_int32),
                ("seed", ctypes.c_uint32),
                ("parity", ctypes.c_int32),
                ("num_threads", ctypes.c_int32)]


class NativeUnavailable(RuntimeError):
    pass


def build_library() -> None:
    """Compile the native library via the Makefile."""
    subprocess.run(["make", "-C", _NATIVE_DIR, "libraytracer_tpu.so"],
                   check=True, capture_output=True)


def load_library(build_if_missing: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build_if_missing:
            raise NativeUnavailable(f"{_LIB_PATH} not built")
        try:
            build_library()
        except Exception as e:
            raise NativeUnavailable(f"could not build native library: {e}")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rt_load_world.argtypes = [ctypes.c_char_p]
    lib.rt_load_world.restype = ctypes.c_void_p
    lib.rt_load_world_n.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.rt_load_world_n.restype = ctypes.c_void_p
    lib.rt_destroy_world.argtypes = [ctypes.c_void_p]
    lib.rt_render.argtypes = [RtFramebuffer, ctypes.c_void_p,
                              ctypes.POINTER(RtRenderOptions)]
    lib.rt_render.restype = ctypes.c_int
    lib.rt_move_camera_position.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                            ctypes.c_float, ctypes.c_float]
    lib.rt_camera_position.argtypes = [ctypes.c_void_p,
                                       ctypes.c_float * 3]
    lib.rt_write_ppm.argtypes = [ctypes.POINTER(RtFramebuffer),
                                 ctypes.c_char_p]
    lib.rt_write_ppm.restype = ctypes.c_int
    lib.rt_last_error.restype = ctypes.c_char_p
    lib.rt_version.restype = ctypes.c_char_p
    _lib = lib
    return lib


class NativeWorld:
    """Pythonic wrapper over the C ABI handle."""

    def __init__(self, source: str):
        self._lib = load_library()
        data = source.encode("utf-8")
        self._handle = self._lib.rt_load_world_n(data, len(data))
        if not self._handle:
            raise ValueError(
                f"parse error: {self._lib.rt_last_error().decode()}")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.rt_destroy_world(self._handle)
            self._handle = None

    def render(self, width: int, height: int, samples_per_pixel: int = 16,
               max_ray_bounces: int = 8, seed: int = 0, parity: bool = True,
               num_threads: int = 0) -> np.ndarray:
        """Render to an RGBA8 [H, W, 4] array (vertically flipped, ready)."""
        buf = np.zeros((height, width, 4), np.uint8)
        fb = RtFramebuffer(width, height,
                           buf.ctypes.data_as(ctypes.POINTER(RtColorU8)))
        opts = RtRenderOptions(samples_per_pixel, max_ray_bounces, seed,
                               1 if parity else 0, num_threads)
        rc = self._lib.rt_render(fb, self._handle, ctypes.byref(opts))
        if rc != 0:
            raise RuntimeError(
                f"render failed: {self._lib.rt_last_error().decode()}")
        return buf

    def move_camera(self, dx: float, dy: float, dz: float) -> None:
        self._lib.rt_move_camera_position(self._handle, dx, dy, dz)

    def camera_position(self):
        out = (ctypes.c_float * 3)()
        self._lib.rt_camera_position(self._handle, out)
        return np.array(out, np.float32)


def write_ppm_native(framebuffer: np.ndarray, path: str) -> None:
    lib = load_library()
    fb = np.ascontiguousarray(framebuffer, np.uint8)
    assert fb.ndim == 3 and fb.shape[2] == 4
    cfb = RtFramebuffer(fb.shape[1], fb.shape[0],
                        fb.ctypes.data_as(ctypes.POINTER(RtColorU8)))
    rc = lib.rt_write_ppm(ctypes.byref(cfb), path.encode())
    if rc != 0:
        raise RuntimeError(lib.rt_last_error().decode())
