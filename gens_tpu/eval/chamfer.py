"""DTU quantitative evaluation: mesh -> dense surface samples -> 0.2 mm
radius downsample -> ObsMask crop -> symmetric Chamfer vs GT points.

Re-design of /root/reference/evaluation/dtu_eval.py (the acceptance test
producing the headline 1.34 mm number, README.md:64-81). Protocol parity:

* per-triangle lattice sampling at the downsample density (dtu_eval.py:11-20,
  61-78), vertices included;
* greedy radius-0.2 downsample via KD-tree (dtu_eval.py:93-102);
* ObsMask + bounding-box crop for accuracy, ground-plane filter for
  completeness (dtu_eval.py:104-142);
* accuracy = mean d2s (< 20 mm), completeness = mean s2d (< 20 mm),
  overall = (d2s + s2d) / 2, averaged over the 15 SparseNeuS test scans
  (dtu_eval.py:47,165-171).

Uses scipy cKDTree instead of sklearn/open3d; reads PLY via gens_tpu.mesh.ply.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

DTU_TEST_SCANS = (24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114,
                  118, 122)


def sample_mesh_points(vertices: np.ndarray, triangles: np.ndarray,
                       density: float = 0.2) -> np.ndarray:
    """Dense per-triangle lattice samples at the given density + original
    vertices (dtu_eval.py:57-78)."""
    tri_vert = vertices[triangles]
    v1 = tri_vert[:, 1] - tri_vert[:, 0]
    v2 = tri_vert[:, 2] - tri_vert[:, 0]
    l1 = np.linalg.norm(v1, axis=-1, keepdims=True)
    l2 = np.linalg.norm(v2, axis=-1, keepdims=True)
    area2 = np.linalg.norm(np.cross(v1, v2), axis=-1, keepdims=True)
    nz = (area2 > 0)[:, 0]
    l1, l2, area2, v1, v2, base = (a[nz] for a in
                                   (l1, l2, area2, v1, v2, tri_vert[:, 0]))
    thr = density * np.sqrt(l1 * l2 / area2)
    n1 = np.floor(l1 / thr)[:, 0].astype(np.int64)
    n2 = np.floor(l2 / thr)[:, 0].astype(np.int64)

    pts = [vertices]
    # group triangles by (n1, n2) so each lattice is built once, vectorized.
    # On irregular meshes the number of distinct (n1, n2) pairs can explode
    # (thousands of tiny python iterations); above a budget, round counts UP
    # to powers of two — strictly DENSER sampling than the protocol asks,
    # harmless because radius_downsample(0.2) immediately follows, and it
    # caps the loop at ~log² buckets.
    keys = n1 * 100000 + n2
    if len(np.unique(keys)) > 256:
        n1 = np.where(n1 > 0, 2 ** np.ceil(np.log2(n1 + 1)).astype(np.int64),
                      0)
        n2 = np.where(n2 > 0, 2 ** np.ceil(np.log2(n2 + 1)).astype(np.int64),
                      0)
        keys = n1 * 100000 + n2
    for key in np.unique(keys):
        sel = np.nonzero(keys == key)[0]
        a, b = int(n1[sel[0]]), int(n2[sel[0]])
        c = np.mgrid[: a + 1, : b + 1].astype(np.float64) + 0.5
        c[0] /= max(a, 1e-7)
        c[1] /= max(b, 1e-7)
        c = np.transpose(c, (1, 2, 0)).reshape(-1, 2)
        k = c[c.sum(axis=-1) < 1]  # (m, 2) barycentric lattice
        if len(k) == 0:
            continue
        q = (k[None, :, :1] * v1[sel, None] + k[None, :, 1:] * v2[sel, None]
             + base[sel, None])
        pts.append(q.reshape(-1, 3))
    return np.concatenate(pts, axis=0)


def radius_downsample(points: np.ndarray, radius: float = 0.2,
                      seed: int = 0) -> np.ndarray:
    """Greedy shuffle-then-suppress downsample (dtu_eval.py:88-102)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(points))
    pts = points[order]
    tree = cKDTree(pts)
    mask = np.ones(len(pts), bool)
    neighbors = tree.query_ball_point(pts, r=radius, workers=-1)
    for cur, idxs in enumerate(neighbors):
        if mask[cur]:
            mask[idxs] = False
            mask[cur] = True
    return pts[mask]


def load_obs_mask(path: str):
    from scipy.io import loadmat

    m = loadmat(path)
    return m["ObsMask"], m["BB"].astype(np.float32), m["Res"]


def evaluate_scan(mesh_path: str, dataset_dir: str, scan: int,
                  density: float = 0.2, patch: float = 60.0,
                  max_dist: float = 20.0) -> Dict[str, float]:
    """Chamfer evaluation of one scan mesh against DTU GT points."""
    from scipy.io import loadmat
    from scipy.spatial import cKDTree

    from gens_tpu.mesh.ply import read_ply

    verts, tris = read_ply(mesh_path)
    data_pcd = sample_mesh_points(verts.astype(np.float64), tris, density)
    data_down = radius_downsample(data_pcd, density)

    ObsMask, BB, Res = load_obs_mask(
        os.path.join(dataset_dir, "ObsMask", f"ObsMask{scan}_10.mat"))

    inbound = ((data_down >= BB[:1] - patch)
               & (data_down < BB[1:] + patch * 2)).sum(axis=-1) == 3
    data_in = data_down[inbound]

    grid = np.around((data_in - BB[:1]) / Res).astype(np.int32)
    grid_in = ((grid >= 0)
               & (grid < np.expand_dims(ObsMask.shape, 0))).sum(axis=-1) == 3
    g = grid[grid_in]
    in_obs = ObsMask[g[:, 0], g[:, 1], g[:, 2]].astype(bool)
    data_in_obs = data_in[grid_in][in_obs]

    stl_path = os.path.join(dataset_dir, "Points", "stl",
                            f"stl{scan:03}_total.ply")
    stl, _ = read_ply(stl_path)
    stl = stl.astype(np.float64)

    d2s = cKDTree(stl).query(data_in_obs, k=1, workers=-1)[0]
    mean_d2s = d2s[d2s < max_dist].mean()

    plane = loadmat(os.path.join(dataset_dir, "ObsMask",
                                 f"Plane{scan}.mat"))["P"]
    stl_hom = np.concatenate([stl, np.ones_like(stl[:, :1])], -1)
    stl_above = stl[(plane.reshape(1, 4) * stl_hom).sum(-1) > 0]

    s2d = cKDTree(data_in).query(stl_above, k=1, workers=-1)[0]
    mean_s2d = s2d[s2d < max_dist].mean()

    return {"scan": scan, "d2s": float(mean_d2s), "s2d": float(mean_s2d),
            "overall": float((mean_d2s + mean_s2d) / 2)}


def evaluate_all(mesh_dir: str, dataset_dir: str,
                 scans=DTU_TEST_SCANS, pattern="scan{}.ply") -> Dict:
    """Evaluate all test scans and report the mean overall Chamfer
    (dtu_eval.py:165-171)."""
    results = []
    for scan in scans:
        path = os.path.join(mesh_dir, pattern.format(scan))
        results.append(evaluate_scan(path, dataset_dir, scan))
        print(results[-1])
    mean = {
        "d2s": float(np.mean([r["d2s"] for r in results])),
        "s2d": float(np.mean([r["s2d"] for r in results])),
        "overall": float(np.mean([r["overall"] for r in results])),
    }
    return {"per_scan": results, "mean": mean}


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("dtu chamfer eval")
    p.add_argument("--mesh_dir", required=True)
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--pattern", default="scan{}.ply")
    args = p.parse_args(argv)
    out = evaluate_all(args.mesh_dir, args.dataset_dir, pattern=args.pattern)
    print("final:", out["mean"])


if __name__ == "__main__":
    main()
