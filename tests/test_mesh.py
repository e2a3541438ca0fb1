"""Isosurface + PLY + extraction pipeline tests against analytic spheres."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from gens_tpu.mesh.extract import eval_sdf_grid, extract_geometry
from gens_tpu.mesh.isosurface import marching_tetrahedra, _load
from gens_tpu.mesh.ply import apply_transform, read_ply, write_ply


def _sphere_grid(res=33, radius=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    # -sdf convention: positive inside
    return radius - np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)


def _mesh_stats(verts, tris, res=33):
    # map grid-index coords to [-1, 1]
    v = verts / (res - 1) * 2.0 - 1.0
    tri = v[tris]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=-1).sum()
    # signed volume via divergence theorem (orientation check)
    vol = np.einsum("ij,ij->i", tri[:, 0], cross).sum() / 6.0
    return v, area, vol


def test_native_library_builds():
    assert _load() is not None, "native isosurface library failed to build"


@pytest.mark.parametrize("force_numpy", [False, True])
def test_sphere_surface(force_numpy):
    res, radius = 33, 0.6
    grid = _sphere_grid(res, radius)
    verts, tris = marching_tetrahedra(grid, 0.0, force_numpy=force_numpy)
    assert len(verts) > 100 and len(tris) > 100
    v, area, vol = _mesh_stats(verts, tris, res)

    # all vertices on the sphere
    r = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(r, radius, atol=0.05)

    # area ~ 4 pi r^2, signed volume ~ +4/3 pi r^3 (outward orientation)
    np.testing.assert_allclose(area, 4 * np.pi * radius ** 2, rtol=0.05)
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * radius ** 3, rtol=0.05)

    # watertight: every edge shared by exactly 2 triangles
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_native_matches_numpy():
    grid = _sphere_grid(17, 0.5)
    v1, t1 = marching_tetrahedra(grid, 0.0, force_numpy=False)
    v2, t2 = marching_tetrahedra(grid, 0.0, force_numpy=True)
    assert v1.shape == v2.shape and t1.shape == t2.shape
    # same vertex sets (order may differ)
    s1 = np.sort(v1.round(4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]),
                 order=["x", "y", "z"], axis=0)
    s2 = np.sort(v2.round(4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]),
                 order=["x", "y", "z"], axis=0)
    assert (s1 == s2).all()


def test_extract_geometry_pipeline():
    radius = 0.45

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - radius

    verts, tris = extract_geometry(sdf_fn, [-1, -1, -1], [1, 1, 1],
                                   resolution=64, block=32)
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, radius, atol=0.03)


def test_ply_roundtrip(rng):
    verts = rng.rand(50, 3).astype(np.float32)
    tris = rng.randint(0, 50, size=(30, 3)).astype(np.int32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.ply")
        write_ply(path, verts, tris)
        v2, t2 = read_ply(path)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    assert (t2 == tris).all()


def test_apply_transform():
    verts = np.array([[1.0, 0, 0], [0, 1, 0]], np.float32)
    mat = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    mat[:3, 3] = [1, 0, 0]
    out = apply_transform(verts, mat)
    np.testing.assert_allclose(out, [[3, 0, 0], [1, 2, 0]], atol=1e-6)
