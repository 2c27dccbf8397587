"""Loader for the native (C++) host library.

The library is built on demand from csrc/ with the system toolchain; the
shared object is cached inside the package tree.  All native entry points are
plain C ABI accessed via ctypes (no pybind11 in this environment).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CSRC = os.path.join(os.path.dirname(_PKG_DIR), "csrc")
_SO_PATH = os.path.join(_PKG_DIR, "_native", "libnphm_native.so")


class NativeUnavailable(RuntimeError):
    pass


def _build():
    if not os.path.isdir(_CSRC):
        raise NativeUnavailable(f"csrc directory not found at {_CSRC}")
    env = dict(os.environ, OUT=_SO_PATH)
    try:
        subprocess.run(
            ["make", "-s", f"OUT={_SO_PATH}"],
            cwd=_CSRC,
            check=True,
            capture_output=True,
            env=env,
        )
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise NativeUnavailable(
            f"native build failed:\n{e.stdout.decode()}\n{e.stderr.decode()}"
        ) from e


def _sources_newer() -> bool:
    so_mtime = os.path.getmtime(_SO_PATH)
    for fn in os.listdir(_CSRC):
        if fn.endswith((".cpp", ".h")) or fn == "Makefile":
            if os.path.getmtime(os.path.join(_CSRC, fn)) > so_mtime:
                return True
    return False


def get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO_PATH) or (
            os.path.isdir(_CSRC) and _sources_newer()
        ):
            _build()
        lib = ctypes.CDLL(_SO_PATH)

        lib.nphm_marching_tets.restype = ctypes.c_int
        lib.nphm_marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nphm_marching_tets_window.restype = ctypes.c_int
        lib.nphm_marching_tets_window.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nphm_marching_tets_blocks.restype = ctypes.c_int
        lib.nphm_marching_tets_blocks.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nphm_free.restype = None
        lib.nphm_free.argtypes = [ctypes.c_void_p]

        f32p = ctypes.POINTER(ctypes.c_float)
        lib.nphm_rasterize.restype = ctypes.c_int
        lib.nphm_rasterize.argtypes = [
            f32p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            f32p,  # face normals (or None: computed natively)
            f32p, f32p,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            f32p, f32p, f32p,
            ctypes.POINTER(ctypes.c_uint8),
        ]

        lib.nphm_face_normals.restype = ctypes.c_int
        lib.nphm_face_normals.argtypes = [
            f32p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            f32p,
        ]

        lib.nphm_render_visible.restype = ctypes.c_int
        lib.nphm_render_visible.argtypes = [
            f32p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            f32p,  # face normals (or None: computed natively)
            f32p, f32p,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float,  # backface cos threshold
            f32p, f32p,
            ctypes.POINTER(ctypes.c_int64),
        ]

        _LIB = lib
        return _LIB
