"""Isosurface extraction: ctypes binding to the native C++ marching-tetrahedra
kernel (native/isosurface.cpp), with a pure-numpy fallback.

Replaces the reference's PyMCubes call (implicit_surface.py:423). The native
library is built on demand with g++ if the shared object is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "isosurface.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libisosurface.so")

_lib: Optional[ctypes.CDLL] = None


def _build_native() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and os.path.exists(_SRC):
        if not _build_native():
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.extract_isosurface.restype = ctypes.c_int
    lib.extract_isosurface.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.iso_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def marching_tetrahedra(grid: np.ndarray, iso: float = 0.0,
                        force_numpy: bool = False
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the ``grid == iso`` surface. grid: (nx, ny, nz) float.

    Returns (vertices (V, 3) float32 in grid-index space, triangles (T, 3)
    int32). Triangles are wound with normals pointing toward the below-iso
    region (outward when marching -sdf grids, which are positive inside).
    """
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    lib = None if force_numpy else _load()
    if lib is not None:
        vp = ctypes.POINTER(ctypes.c_float)()
        tp = ctypes.POINTER(ctypes.c_int32)()
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        rc = lib.extract_isosurface(
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            grid.shape[0], grid.shape[1], grid.shape[2], iso,
            ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
            ctypes.byref(nt))
        if rc == 0:
            verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
                if nv.value else np.zeros((0, 3), np.float32)
            tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy() \
                if nt.value else np.zeros((0, 3), np.int32)
            lib.iso_free(vp)
            lib.iso_free(tp)
            return verts, tris
    return _marching_tetrahedra_numpy(grid, iso)


# -- pure-numpy fallback (vectorized, same 6-tet decomposition) -------------

_TETS = np.array([
    [0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7],
    [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7],
], np.int64)
_CORNER_OFFS = np.array(
    [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], np.int64)


def _marching_tetrahedra_numpy(grid: np.ndarray, iso: float):
    nx, ny, nz = grid.shape
    xs, ys, zs = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=-1)  # (M,3)

    # corner values per cube
    cv = np.stack(
        [grid[base[:, 0] + o[0], base[:, 1] + o[1], base[:, 2] + o[2]]
         for o in _CORNER_OFFS], axis=-1)  # (M, 8)
    active = ((cv < iso).any(-1)) & ((cv >= iso).any(-1))
    base, cv = base[active], cv[active]

    verts_list, tris_list = [], []
    vert_index = {}

    def edge_vertex(pa, pb, va, vb):
        key = (tuple(pa), tuple(pb)) if tuple(pa) <= tuple(pb) else (
            tuple(pb), tuple(pa))
        if key in vert_index:
            return vert_index[key]
        denom = vb - va
        t = 0.5 if denom == 0 else np.clip((iso - va) / denom, 0.0, 1.0)
        v = pa + t * (pb - pa)
        idx = len(verts_list)
        verts_list.append(v.astype(np.float32))
        vert_index[key] = idx
        return idx

    def emit_oriented(a, b, c, inside):
        va, vb, vc = verts_list[a], verts_list[b], verts_list[c]
        n = np.cross(vb - va, vc - va)
        if np.dot(n, (va + vb + vc) / 3.0 - inside) < 0:
            tris_list.append((a, b, c))
        else:
            tris_list.append((a, c, b))

    for m in range(base.shape[0]):
        for tet in _TETS:
            p = base[m][None] + _CORNER_OFFS[tet]
            v = cv[m][tet]
            ins = np.where(v < iso)[0]
            outs = np.where(v >= iso)[0]
            if len(ins) == 0 or len(ins) == 4:
                continue
            if len(ins) in (1, 3):
                lone = ins[0] if len(ins) == 1 else outs[0]
                others = [i for i in range(4) if i != lone]
                t0 = edge_vertex(p[lone], p[others[0]], v[lone], v[others[0]])
                t1 = edge_vertex(p[lone], p[others[1]], v[lone], v[others[1]])
                t2 = edge_vertex(p[lone], p[others[2]], v[lone], v[others[2]])
                inside = p[ins].mean(axis=0).astype(np.float32)
                emit_oriented(t0, t1, t2, inside)
            else:
                a, b = ins
                c1, c2 = outs
                q0 = edge_vertex(p[a], p[c1], v[a], v[c1])
                q1 = edge_vertex(p[a], p[c2], v[a], v[c2])
                q2 = edge_vertex(p[b], p[c2], v[b], v[c2])
                q3 = edge_vertex(p[b], p[c1], v[b], v[c1])
                inside = p[[a, b]].mean(axis=0).astype(np.float32)
                emit_oriented(q0, q1, q2, inside)
                emit_oriented(q0, q2, q3, inside)

    verts = (np.stack(verts_list) if verts_list
             else np.zeros((0, 3), np.float32))
    tris = (np.asarray(tris_list, np.int32) if tris_list
            else np.zeros((0, 3), np.int32))
    return verts, tris
