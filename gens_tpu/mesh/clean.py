"""Mesh cleaning: mask-visibility filtering + frustum ray-cast consensus.

Re-design of /root/reference/utils/clean_mesh.py:9-130 (online cleaning at
val time) and evaluation/clean_meshes.py (offline DTU_TEST variant):

* ``clean_mesh_by_mask``: keep faces whose vertices project inside the
  DILATED object mask of at least ``min_nb_visible`` views
  (clean_mesh.py:9-34; dilation disk(11) via cv2 instead of skimage).
* ``clean_mesh_outside_frustum``: cast a ray through every (upscaled) pixel
  of every view, keep only first-hit faces, and drop connected components
  smaller than 500 faces (clean_mesh.py:37-106). Ray casting uses the
  native BVH (native/raycast.cpp) instead of pyembree.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "raycast.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libraycast.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and os.path.exists(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                 "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    lib.bvh_first_hit.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


class Raycaster:
    """First-hit ray casting against a triangle mesh (native BVH)."""

    def __init__(self, verts: np.ndarray, tris: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native raycast library unavailable")
        self.lib = lib
        self._verts = np.ascontiguousarray(verts, np.float32)
        self._tris = np.ascontiguousarray(tris, np.int32)
        self.handle = lib.bvh_build(
            self._verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._verts),
            self._tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(self._tris))

    def first_hit(self, origins: np.ndarray, dirs: np.ndarray):
        origins = np.ascontiguousarray(origins, np.float32)
        dirs = np.ascontiguousarray(dirs, np.float32)
        n = len(origins)
        hit_tri = np.empty(n, np.int32)
        hit_t = np.empty(n, np.float32)
        self.lib.bvh_first_hit(
            ctypes.c_void_p(self.handle),
            origins.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            hit_tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            hit_t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return hit_tri, hit_t

    def __del__(self):
        try:
            self.lib.bvh_free(ctypes.c_void_p(self.handle))
        except Exception:
            pass


def _dilate_mask(mask: np.ndarray, radius: int = 11) -> np.ndarray:
    import cv2

    kernel = cv2.getStructuringElement(
        cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
    return cv2.dilate(mask.astype(np.uint8), kernel).astype(np.float32)


def clean_mesh_by_mask(verts: np.ndarray, tris: np.ndarray,
                       masks: np.ndarray, intrs: np.ndarray,
                       c2ws: np.ndarray, min_nb_visible: int = 1,
                       dilate_radius: int = 11):
    """Keep faces whose 3 vertices all project inside the dilated mask of at
    least ``min_nb_visible`` views (reference clean_mesh.py:9-34,109-121)."""
    V = masks.shape[0]
    H, W = masks.shape[1], masks.shape[2]
    vis = np.zeros(len(verts), np.int32)
    for v in range(V):
        dm = _dilate_mask(masks[v], dilate_radius)
        w2c = np.linalg.inv(c2ws[v])
        cam = verts @ w2c[:3, :3].T + w2c[:3, 3]
        uvw = cam @ intrs[v][:3, :3].T
        z = uvw[:, 2]
        x = uvw[:, 0] / np.where(np.abs(z) < 1e-8, 1e-8, z)
        y = uvw[:, 1] / np.where(np.abs(z) < 1e-8, 1e-8, z)
        inside = (z > 0) & (x >= 0) & (x < W) & (y >= 0) & (y < H)
        xi = np.clip(x.astype(np.int64), 0, W - 1)
        yi = np.clip(y.astype(np.int64), 0, H - 1)
        vis += (inside & (dm[yi, xi] > 0)).astype(np.int32)
    # "strictly more than min_nb_visible views" and ALL 3 verts valid
    # (reference clean_mesh.py:29-31)
    face_ok = (vis[tris] > min_nb_visible).all(axis=1)
    return _compact(verts, tris[face_ok])


def face_components(tris: np.ndarray) -> np.ndarray:
    """Connected components over faces sharing an edge (replaces
    trimesh.graph.connected_components).

    Vectorized via scipy sparse CSGraph: faces sharing an edge are linked
    through a face<->sorted-edge bipartite incidence matrix, and
    ``connected_components(E @ E.T)``-style closure comes free from running
    CC on the bipartite graph itself. A 512-res marching-tetrahedra mesh has
    millions of faces — the previous pure-Python union-find took
    minutes-to-hours there; this is seconds."""
    from scipy import sparse
    from scipy.sparse.csgraph import connected_components

    n = len(tris)
    if n == 0:
        return np.zeros(0, np.int64)
    # 3 undirected edges per face, canonicalized
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e = np.sort(e, axis=1)
    # dense edge ids via unique rows
    _, edge_id = np.unique(e[:, 0].astype(np.int64) * (tris.max() + 1)
                           + e[:, 1], return_inverse=True)
    face_id = np.tile(np.arange(n, dtype=np.int64), 3)
    n_edges = int(edge_id.max()) + 1
    # bipartite graph: nodes [faces | edges]; CC on it equals CC on the
    # face-adjacency graph
    data = np.ones(len(face_id), np.int8)
    adj = sparse.coo_matrix(
        (data, (face_id, edge_id + n)), shape=(n + n_edges, n + n_edges))
    _, labels = connected_components(adj, directed=False)
    return labels[:n]


def clean_mesh_outside_frustum(verts: np.ndarray, tris: np.ndarray,
                               intrs: np.ndarray, c2ws: np.ndarray,
                               img_hw, upscale: Optional[int] = None,
                               min_component: int = 500):
    """Keep faces visible as FIRST hits from the cameras, then drop small
    components (reference clean_mesh.py:37-106).

    ``upscale=None`` auto-scales the ray grid to out-resolve the faces: if
    pixel footprints are larger than faces, the kept set fragments into
    speckles that ``min_component`` then wipes out (measured: a 192-res
    mesh under 128px/2x rays survives with 0 faces; the reference's fixed
    2x works only because DTU's 1600x1200 frames out-resolve its 512-res
    meshes)."""
    if len(tris) == 0:
        return verts, tris
    caster = Raycaster(verts, tris)
    H, W = img_hw
    if upscale is None:
        # median face edge vs. pixel footprint at the median face depth
        med_edge = float(np.median(np.linalg.norm(
            verts[tris[:, 0]] - verts[tris[:, 1]], axis=-1)))
        cam = c2ws[0][:3, 3]
        depth = float(np.median(np.linalg.norm(
            verts[tris[:, 0]] - cam[None], axis=-1)))
        focal = float(intrs[0][0, 0])
        pix_world = depth / max(focal, 1e-6)
        upscale = int(np.clip(np.ceil(1.5 * pix_world / max(med_edge, 1e-9)),
                              2, 8))
    keep = np.zeros(len(tris), bool)
    for v in range(len(c2ws)):
        hh, ww = H * upscale, W * upscale
        ys, xs = np.meshgrid(
            np.linspace(0, H - 1, hh, dtype=np.float32),
            np.linspace(0, W - 1, ww, dtype=np.float32), indexing="ij")
        pix = np.stack([xs.ravel(), ys.ravel(),
                        np.ones(hh * ww, np.float32)], axis=-1)
        d = pix @ np.linalg.inv(intrs[v][:3, :3]).T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = d @ c2ws[v][:3, :3].T
        o = np.broadcast_to(c2ws[v][:3, 3], d.shape)
        hit, _ = caster.first_hit(o, d)
        keep[hit[hit >= 0]] = True

    tris_kept = tris[keep]
    if len(tris_kept) == 0:
        return _compact(verts, tris_kept)
    comp = face_components(tris_kept)
    _, inverse, counts = np.unique(comp, return_inverse=True,
                                   return_counts=True)
    tris_kept = tris_kept[counts[inverse] >= min_component]
    return _compact(verts, tris_kept)


def _compact(verts: np.ndarray, tris: np.ndarray):
    """Drop unreferenced vertices and reindex faces."""
    if len(tris) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    used = np.unique(tris)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[tris].astype(np.int32)


def clean_mesh(verts: np.ndarray, tris: np.ndarray, masks: np.ndarray,
               intrs: np.ndarray, c2ws: np.ndarray,
               min_nb_visible: int = 1):
    """Full online cleaning (reference clean_mesh, clean_mesh.py:109-130):
    dilated-mask visibility then frustum first-hit consensus."""
    verts, tris = clean_mesh_by_mask(verts, tris, masks, intrs, c2ws,
                                     min_nb_visible)
    if len(tris):
        verts, tris = clean_mesh_outside_frustum(
            verts, tris, intrs, c2ws, (masks.shape[1], masks.shape[2]))
    return verts, tris
