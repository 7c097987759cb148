"""ctypes bindings for the native C++ golden renderer (native/golden.cpp).

Builds the shared library on first use (g++, -O3 -march=native) and caches
it next to the source. Falls back gracefully (``available() == False``) when
no toolchain is present — the NumPy golden then remains the only CPU
reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "golden.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libgolden.so")
_lock = threading.Lock()
_lib = None
_build_error = None


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
            _build_error = e
            return None
        u32p = ctypes.POINTER(ctypes.c_uint32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.tr_render_object.argtypes = [
            u32p, f32p, ctypes.c_int, ctypes.c_int,  # color, depth, H, W
            f32p, f32p, f32p, f32p, ctypes.c_int,  # verts..uvs, vertex_count
            f32p, f32p, f32p, ctypes.c_int, f32p,  # p, transform, ambient, nl, lights
            u32p, ctypes.c_int, ctypes.c_int,  # texture, th, tw
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # phong, threads, avx
            ctypes.c_int,  # filter_bilinear
        ]
        lib.tr_clear.argtypes = [u32p, f32p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_uint32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def render(scene, transform, lights, height, width, clear_color=0,
           num_threads=0, use_avx=-1):
    """Native end-to-end render; same scene/transform/lights dict format as
    golden.cpu_reference.render. num_threads=0 -> hardware concurrency;
    use_avx: -1 auto, 0 scalar (exact reference semantics), 1 force AVX."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native golden unavailable: {_build_error}")

    color = np.full((height, width), np.uint32(clear_color), np.uint32)
    depth = np.full((height, width), np.float32(-3.4028235e38), np.float32)

    tr5 = np.array(
        [transform["distance_above_target"], transform["focal_length"],
         transform["meters_to_pixels"], transform["screen_center"][0],
         transform["screen_center"][1]], np.float32)
    ambient = np.ascontiguousarray(lights["ambient"], np.float32).reshape(4)
    lp = np.ascontiguousarray(lights["light_p"], np.float32).reshape(-1, 3)
    li = np.ascontiguousarray(
        lights["light_intensity"], np.float32).reshape(-1, 4)
    l7 = np.ascontiguousarray(np.concatenate([lp, li], axis=1), np.float32)

    empty_u32 = np.zeros(1, np.uint32)
    for obj, cfg in scene:
        verts = np.ascontiguousarray(obj["vertices"], np.float32)
        cols = np.ascontiguousarray(obj["colors"], np.float32)
        nrms = np.ascontiguousarray(obj["normals"], np.float32)
        uvs = np.ascontiguousarray(obj["uvs"], np.float32)
        p = np.ascontiguousarray(obj["p"], np.float32).reshape(3)
        tex = cfg.get("texture")
        if tex is not None:
            tex = np.ascontiguousarray(tex, np.uint32)
            th, tw = tex.shape
            texp = _u32p(tex)
        else:
            th = tw = 0
            texp = _u32p(empty_u32)
            texp = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint32))
        lib.tr_render_object(
            _u32p(color), _f32p(depth), height, width,
            _f32p(verts), _f32p(cols), _f32p(nrms), _f32p(uvs),
            verts.shape[0], _f32p(p), _f32p(tr5), _f32p(ambient),
            lp.shape[0], _f32p(l7), texp, th, tw,
            1 if cfg.get("phong") else 0, num_threads, use_avx,
            1 if cfg.get("filter_mode", "nearest") == "bilinear" else 0,
        )
    return color, depth
