"""ctypes bindings for the native host kernels (native/mve_native.cpp).

The shared object builds with ``make -C native`` from the repo root; on
first import we attempt that build automatically. Every binding has a
pure-Python fallback in its calling module, so the framework works
without a compiler — just slower on large meshes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libmve_native.so")
    if not os.path.isfile(so_path):
        makefile = os.path.join(_repo_root(), "native", "Makefile")
        if os.path.isfile(makefile):
            try:
                subprocess.run(["make", "-C", os.path.dirname(makefile)],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.isfile(so_path):
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.mesh_classify_vertices.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int8)]
    lib.mesh_components.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
    lib.mesh_collapse_edges.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64)]
    lib.mesh_collapse_edges.restype = ctypes.c_int64
    lib.mesh_boundary_confidences.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
    lib.fssr_influence_pairs.restype = ctypes.c_int64
    lib.fssr_influence_pairs.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64]
    lib.fssr_scale_filter.restype = ctypes.c_int64
    lib.fssr_scale_filter.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64]
    _LIB = lib
    return _LIB


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def classify_vertices(n_verts: int, faces: np.ndarray):
    """Returns (n_verts,) int8 vertex classes or None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    out = np.empty(n_verts, np.int8)
    lib.mesh_classify_vertices(n_verts, len(faces),
                               _ptr(faces, ctypes.c_int32), _ptr(out, ctypes.c_int8))
    return out


def components(n_verts: int, faces: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    out = np.empty(n_verts, np.int64)
    lib.mesh_components(n_verts, len(faces),
                        _ptr(faces, ctypes.c_int32), _ptr(out, ctypes.c_int64))
    return out


def collapse_edges(vertices: np.ndarray, edges: np.ndarray):
    """Returns (count, target_map, new_vertices) or None."""
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(vertices, np.float32).copy()
    edges = np.ascontiguousarray(edges, np.int64)
    target = np.empty(len(verts), np.int64)
    count = lib.mesh_collapse_edges(len(verts), len(edges),
                                    _ptr(edges, ctypes.c_int64),
                                    _ptr(verts, ctypes.c_float),
                                    _ptr(target, ctypes.c_int64))
    return int(count), target, verts


def fssr_influence_pairs(voxel_pos: np.ndarray, sample_pos: np.ndarray,
                         sample_scale: np.ndarray):
    """Returns (pair_v, pair_s) int64 arrays or None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    vox = np.ascontiguousarray(voxel_pos, np.float64)
    pos = np.ascontiguousarray(sample_pos, np.float64)
    scale = np.ascontiguousarray(sample_scale, np.float64)
    D = ctypes.c_double
    I = ctypes.c_int64
    n = lib.fssr_influence_pairs(len(vox), _ptr(vox, D), len(pos),
                                 _ptr(pos, D), _ptr(scale, D), None, None, 0)
    out_v = np.empty(n, np.int64)
    out_s = np.empty(n, np.int64)
    n2 = lib.fssr_influence_pairs(len(vox), _ptr(vox, D), len(pos),
                                  _ptr(pos, D), _ptr(scale, D),
                                  _ptr(out_v, I), _ptr(out_s, I), n)
    if n2 != n:
        return None
    return out_v, out_s


def fssr_scale_filter(pair_v: np.ndarray, pair_s: np.ndarray,
                      sample_scale: np.ndarray, n_voxels: int):
    """Returns filtered (pair_v, pair_s) or None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    pv = np.ascontiguousarray(pair_v, np.int64).copy()
    ps = np.ascontiguousarray(pair_s, np.int64).copy()
    scale = np.ascontiguousarray(sample_scale, np.float64)
    I = ctypes.c_int64
    D = ctypes.c_double
    kept = lib.fssr_scale_filter(len(pv), _ptr(pv, I), _ptr(ps, I),
                                 _ptr(scale, D), n_voxels)
    return pv[:kept], ps[:kept]


def boundary_confidences(n_verts: int, faces: np.ndarray, vclass: np.ndarray,
                         iterations: int):
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    vclass = np.ascontiguousarray(vclass, np.int8)
    confs = np.ones(n_verts, np.float32)
    lib.mesh_boundary_confidences(n_verts, len(faces),
                                  _ptr(faces, ctypes.c_int32),
                                  _ptr(vclass, ctypes.c_int8),
                                  iterations, _ptr(confs, ctypes.c_float))
    return confs
