"""Tests for Chamfer-eval components and mesh cleaning (native raycaster)."""

import numpy as np
import pytest

from gens_tpu.eval.chamfer import radius_downsample, sample_mesh_points
from gens_tpu.mesh.clean import (Raycaster, clean_mesh_by_mask,
                                 face_components)
from gens_tpu.mesh.isosurface import marching_tetrahedra


def _sphere_mesh(res=33, radius=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    grid = radius - np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)
    v, t = marching_tetrahedra(grid, 0.0)
    v = v / (res - 1) * 2.0 - 1.0
    return v, t


def test_sample_mesh_points_density():
    # two triangles forming a 10x10 square; at density 0.5 expect ~4 pts/unit²
    verts = np.array([[0, 0, 0], [10, 0, 0], [10, 10, 0], [0, 10, 0]],
                     np.float64)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    pts = sample_mesh_points(verts, tris, density=0.5)
    assert len(pts) > 100 * 2  # area 100 / 0.25 = 400 expected samples
    assert np.abs(pts[:, 2]).max() < 1e-9  # all on the plane
    assert pts[:, 0].min() >= -1e-9 and pts[:, 0].max() <= 10 + 1e-9


def test_radius_downsample_spacing():
    rng = np.random.RandomState(0)
    pts = rng.rand(2000, 3) * 4
    down = radius_downsample(pts, radius=0.5)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(down).query(down, k=2)
    assert (d[:, 1] >= 0.5 - 1e-9).all()
    assert len(down) < len(pts)


def test_raycaster_sphere():
    verts, tris = _sphere_mesh()
    caster = Raycaster(verts, tris)
    origins = np.array([[0, -3, 0], [0, -3, 0], [3, 3, 3]], np.float32)
    dirs = np.array([[0, 1, 0], [0, -1, 0], [1, 1, 1]], np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    hit, t = caster.first_hit(origins, dirs)
    assert hit[0] >= 0 and abs(t[0] - 2.4) < 0.05  # 3 - 0.6
    assert hit[1] == -1  # pointing away
    assert hit[2] == -1  # misses entirely


def test_face_components():
    tris = np.array([[0, 1, 2], [1, 2, 3], [4, 5, 6]], np.int32)
    comp = face_components(tris)
    assert comp[0] == comp[1]
    assert comp[0] != comp[2]


def test_clean_mesh_by_mask():
    verts, tris = _sphere_mesh()
    # camera at -y looking at origin, everything in a full mask survives
    from gens_tpu.data.synthetic import look_at

    c2w = look_at(np.array([0, -3.0, 0], np.float32), np.zeros(3, np.float32))
    intr = np.array([[60, 0, 32], [0, 60, 32], [0, 0, 1]], np.float32)
    full = np.ones((2, 64, 64), np.float32)
    v2, t2 = clean_mesh_by_mask(verts, tris, full, np.stack([intr, intr]),
                                np.stack([c2w, c2w]), min_nb_visible=1)
    assert len(t2) > 0.9 * len(tris)

    empty = np.zeros((2, 64, 64), np.float32)
    v3, t3 = clean_mesh_by_mask(verts, tris, empty, np.stack([intr, intr]),
                                np.stack([c2w, c2w]), min_nb_visible=1)
    assert len(t3) == 0
