"""SDF-grid evaluation (device, chunked) -> isosurface (host, native).

Re-design of reference ``extract_geometry`` (implicit_surface.py:407-427):
the dense SDF grid is evaluated in fixed-size blocks under one jit (static
shapes, compiled once), assembled on host, and triangulated by the native
marching-tetrahedra kernel. Vertices are rescaled to ``[bound_min,
bound_max]`` exactly as the reference does (implicit_surface.py:426).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gens_tpu.mesh.isosurface import marching_tetrahedra


def eval_sdf_grid(sdf_fn, bound_min, bound_max, resolution: int,
                  block: int = 64) -> np.ndarray:
    """Evaluate ``-sdf`` on a dense grid, ``block``-chunked along x.

    ``sdf_fn``: jittable (N, 3) -> (N,). Returns (res, res, res) float32
    numpy of -sdf (the reference marches -sdf at threshold 0 so interiors
    are positive, implicit_surface.py:420).
    """
    assert resolution % block == 0 or resolution < block
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)

    block = min(block, resolution)
    # cap any single SDF evaluation at ~block**3 points (the reference's 64^3
    # chunk, implicit_surface.py:408-421): an x-slab is block*res*res points,
    # which at res>=192 OOMs HBM through the 128-wide MLP temps. lax.map runs
    # the sub-chunks SEQUENTIALLY inside one jit -> memory is O(chunk), not
    # O(slab), and there is still exactly one compile.
    chunk = block ** 3

    @jax.jit
    def eval_slab(x_slab):
        gx, gy, gz = jnp.meshgrid(x_slab, jnp.asarray(ys), jnp.asarray(zs),
                                  indexing="ij")
        pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        n = pts.shape[0]
        pad = (-n) % chunk
        pts = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        vals = jax.lax.map(sdf_fn, pts).reshape(-1)[:n]
        return (-vals).reshape(block, resolution, resolution)

    out = np.empty((resolution, resolution, resolution), np.float32)
    for x0 in range(0, resolution, block):
        out[x0:x0 + block] = np.asarray(eval_slab(jnp.asarray(
            xs[x0:x0 + block])))
    return out


def extract_geometry(sdf_fn, bound_min, bound_max, resolution: int = 512,
                     threshold: float = 0.0, block: int = 64
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Full pipeline: grid eval -> marching tetrahedra -> rescale to bounds.

    Returns (vertices (V, 3) float32 world coords, triangles (T, 3) int32).
    """
    u = eval_sdf_grid(sdf_fn, bound_min, bound_max, resolution, block)
    verts, tris = marching_tetrahedra(u, threshold)
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    if len(verts):
        verts = verts / (resolution - 1.0) * (bound_max - bound_min)[None] \
            + bound_min[None]
    return verts, tris
