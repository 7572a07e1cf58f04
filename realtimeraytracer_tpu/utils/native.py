"""ctypes bindings for the native runtime library (native/*.cpp).

The native layer mirrors the reference's use of native code for scene IO
and acceleration-structure building (tinyobjloader + driver AS builds);
everything degrades gracefully to the pure-Python/NumPy implementations
when the library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from realtimeraytracer_tpu.utils import log

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librtrt_native.so")
_lib = None
_tried = False


def load_library(build_if_missing: bool = True):
    """Load (building on first use if a toolchain is present) or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            log.debug("native build unavailable: {}", e)
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c = ctypes
    lib.obj_parse_file.restype = c.c_void_p
    lib.obj_parse_file.argtypes = [c.c_char_p]
    lib.obj_free.argtypes = [c.c_void_p]
    for name in ("obj_num_positions", "obj_num_texcoords", "obj_num_normals",
                 "obj_num_tris", "obj_num_shapes", "obj_num_mtllibs"):
        getattr(lib, name).restype = c.c_int64
        getattr(lib, name).argtypes = [c.c_void_p]
    for name, ty in (("obj_positions", c.c_float), ("obj_texcoords", c.c_float),
                     ("obj_normals", c.c_float), ("obj_corners", c.c_int64),
                     ("obj_tri_shapes", c.c_int32)):
        getattr(lib, name).restype = c.POINTER(ty)
        getattr(lib, name).argtypes = [c.c_void_p]
    for name in ("obj_shape_name", "obj_shape_material", "obj_mtllib"):
        getattr(lib, name).restype = c.c_char_p
        getattr(lib, name).argtypes = [c.c_void_p, c.c_int64]
    lib.bvh_num_nodes.restype = c.c_int64
    lib.bvh_num_nodes.argtypes = [c.c_int64, c.c_int64]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.bvh_build.restype = c.c_int64
    lib.bvh_build.argtypes = [f32p, f32p, f32p, c.c_int64, c.c_int64,
                              f32p, f32p, i32p, i32p, i32p, i32p]
    lib.bvh_build_sah.restype = c.c_int64
    lib.bvh_build_sah.argtypes = [f32p, f32p, f32p, c.c_int64, c.c_int64,
                                  c.c_int64, f32p, f32p, i32p, i32p, i32p,
                                  i32p]
    _lib = lib
    log.debug("native library loaded: {}", _LIB_PATH)
    return _lib


def native_build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                     leaf_size: int = 4, builder: str = "sah"):
    """Native BVH build (binned SAH by default, or Morton LBVH);
    returns ops.bvh.BVHArrays or None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    from realtimeraytracer_tpu.ops.bvh import BVHArrays

    t = len(v0)
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    order = np.empty(t, np.int32)
    if builder == "sah":
        max_nodes = 2 * t + 1
        node_min = np.empty((max_nodes, 3), np.float32)
        node_max = np.empty((max_nodes, 3), np.float32)
        node_skip = np.empty(max_nodes, np.int32)
        node_first = np.empty(max_nodes, np.int32)
        node_count = np.empty(max_nodes, np.int32)
        n = lib.bvh_build_sah(v0.reshape(-1), v1.reshape(-1), v2.reshape(-1),
                              t, leaf_size, max_nodes, node_min.reshape(-1),
                              node_max.reshape(-1), node_skip, node_first,
                              node_count, order)
        assert n > 0, "SAH build failed"
        node_min = node_min[:n].copy()
        node_max = node_max[:n].copy()
        node_skip = node_skip[:n].copy()
        node_first = node_first[:n].copy()
        node_count = node_count[:n].copy()
    else:
        n = lib.bvh_num_nodes(t, leaf_size)
        node_min = np.empty((n, 3), np.float32)
        node_max = np.empty((n, 3), np.float32)
        node_skip = np.empty(n, np.int32)
        node_first = np.empty(n, np.int32)
        node_count = np.empty(n, np.int32)
        written = lib.bvh_build(v0.reshape(-1), v1.reshape(-1), v2.reshape(-1),
                                t, leaf_size, node_min.reshape(-1),
                                node_max.reshape(-1), node_skip, node_first,
                                node_count, order)
        assert written == n, (written, n)
    return BVHArrays(node_min=node_min, node_max=node_max,
                     node_skip=node_skip, node_first=node_first,
                     node_count=node_count,
                     tri_v0=v0[order], tri_v1=v1[order], tri_v2=v2[order],
                     tri_id=order)


class NativeObj:
    """Parsed OBJ handle (RAII wrapper over the C++ parser)."""

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library not available")
        self._lib = lib
        self._h = lib.obj_parse_file(path.encode())
        if not self._h:
            raise FileNotFoundError(path)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.obj_free(self._h)
            self._h = None

    def arrays(self):
        lib, h = self._lib, self._h
        # n == 0 => the C++ vector's data() may be NULL; as_array would
        # raise "NULL pointer access" (OBJ files with no vt/vn hit this).
        np_from = lambda ptr, n, dt: (
            np.empty((0,), dt) if n == 0 else np.ctypeslib.as_array(
                ptr(h), shape=(n,)).astype(dt, copy=True))
        npos = lib.obj_num_positions(h)
        ntex = lib.obj_num_texcoords(h)
        nnrm = lib.obj_num_normals(h)
        ntri = lib.obj_num_tris(h)
        positions = np_from(lib.obj_positions, npos * 3, np.float32).reshape(-1, 3)
        texcoords = np_from(lib.obj_texcoords, ntex * 2, np.float32).reshape(-1, 2)
        normals = np_from(lib.obj_normals, nnrm * 3, np.float32).reshape(-1, 3)
        corners = np_from(lib.obj_corners, ntri * 9, np.int64).reshape(-1, 3, 3)
        tri_shape = np_from(lib.obj_tri_shapes, ntri, np.int32)
        shapes = [
            (lib.obj_shape_name(h, i).decode(errors="replace"),
             lib.obj_shape_material(h, i).decode(errors="replace"))
            for i in range(lib.obj_num_shapes(h))
        ]
        mtllibs = [lib.obj_mtllib(h, i).decode(errors="replace")
                   for i in range(lib.obj_num_mtllibs(h))]
        return positions, texcoords, normals, corners, tri_shape, shapes, mtllibs
