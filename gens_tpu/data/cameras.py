"""Shared camera/geometry utilities for the data pipeline (host-side numpy).

Re-designs the geometry embedded in the reference datasets
(/root/reference/datasets/dtu.py:12-71,162-229): MVSNet camera-file parsing,
projection-matrix re-decomposition, frustum-union scale matrices and ray
generation.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np


def load_K_Rt_from_P(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Decompose a 3x4 projection matrix into intrinsics (3, 3) and c2w
    (4, 4) (reference dtu.py:12-33, via cv2.decomposeProjectionMatrix)."""
    import cv2

    out = cv2.decomposeProjectionMatrix(np.asarray(P, np.float64))
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intr = K.astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intr, pose


def read_mvsnet_cam(path: str, interval_scale: float = 1.0,
                    num_interval: int = 192):
    """Parse an MVSNet-format camera txt (reference dtu.py:162-191).

    Returns (intr (3,3), w2c (4,4), (depth_min, depth_max))."""
    with open(path) as f:
        lines = [l.rstrip() for l in f.readlines()]
    w2c = np.fromstring(" ".join(lines[1:5]), dtype=np.float32,
                        sep=" ").reshape(4, 4)
    intr = np.fromstring(" ".join(lines[7:10]), dtype=np.float32,
                         sep=" ").reshape(3, 3)
    depth_min = float(lines[11].split()[0])
    depth_interval = float(lines[11].split()[1]) * interval_scale
    depth_max = depth_min + depth_interval * num_interval
    return intr, w2c, (depth_min, depth_max)


def read_pfm(path: str) -> np.ndarray:
    """Read a PFM depth map (reference dtu.py:36-71)."""
    with open(path, "rb") as f:
        header = f.readline().decode("utf-8").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError("not a PFM file")
        dims = re.match(r"^(\d+)\s(\d+)\s*$", f.readline().decode("utf-8"))
        if not dims:
            raise ValueError("malformed PFM header")
        width, height = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).copy()


def frustum_union_scale_mat(img_hw, intrs: Sequence[np.ndarray],
                            w2cs: Sequence[np.ndarray],
                            near_fars: Sequence[Tuple[float, float]],
                            factor: float = 1.0):
    """Scale matrix mapping the union of all view frusta into the unit
    sphere (reference get_scale_mat, dtu.py:193-229).

    Returns (scale_mat (4,4), scale_factor=1/radius)."""
    bnds = np.full((3, 2), np.inf)
    bnds[:, 1] = -np.inf
    im_h, im_w = img_hw
    corner_x = np.array([0, 0, im_w, im_w, 0, 0, im_w, im_w], np.float64)
    corner_y = np.array([0, im_h, 0, im_h, 0, im_h, 0, im_h], np.float64)

    for intr, w2c, (dmin, dmax) in zip(intrs, w2cs, near_fars):
        depth = np.array([dmin] * 4 + [dmax] * 4, np.float64)
        pts = np.stack([
            (corner_x - intr[0, 2]) * depth / intr[0, 0],
            (corner_y - intr[1, 2]) * depth / intr[1, 1],
            depth,
        ]).astype(np.float32)
        homo = np.concatenate([pts, np.ones_like(pts[:1])], axis=0)
        world = (np.linalg.inv(w2c) @ homo)[:3]
        bnds[:, 0] = np.minimum(bnds[:, 0], world.min(axis=1))
        bnds[:, 1] = np.maximum(bnds[:, 1], world.max(axis=1))

    center = ((bnds[:, 1] + bnds[:, 0]) / 2).astype(np.float32)
    radius = float((bnds[:, 1] - bnds[:, 0]).max() / 2) * factor
    scale_mat = np.diag([radius, radius, radius, 1.0]).astype(np.float32)
    scale_mat[:3, 3] = center
    return scale_mat, 1.0 / radius


def normalize_cameras(intrs, w2cs, scale_mat):
    """Re-decompose P = K W2C S per view into normalized (intr, c2w) pairs
    plus camera-distance near/far (reference dtu.py:326-341)."""
    new_intrs, c2ws, near_fars = [], [], []
    for intr, w2c in zip(intrs, w2cs):
        K4 = np.eye(4, dtype=np.float32)
        K4[:3, :3] = intr
        P = (K4 @ w2c @ scale_mat)[:3, :4]
        new_intr, c2w = load_K_Rt_from_P(P)
        new_intrs.append(new_intr[:3, :3])
        c2ws.append(c2w)
        dist = float(np.linalg.norm(c2w[:3, 3]))
        near_fars.append((0.95 * (dist - 1.0), 1.05 * (dist + 1.0)))
    return (np.stack(new_intrs), np.stack(c2ws),
            np.asarray(near_fars, np.float32))


def pixels_to_rays(pixels_x: np.ndarray, pixels_y: np.ndarray,
                   intr: np.ndarray, c2w: np.ndarray):
    """Unit-norm world rays through pixel centers (reference dtu.py:399-403)."""
    p = np.stack([pixels_x, pixels_y, np.ones_like(pixels_x)],
                 axis=-1).astype(np.float32)
    p = p @ np.linalg.inv(intr).T
    d = p / np.linalg.norm(p, axis=-1, keepdims=True)
    rays_d = d @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape).copy()
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def pose_distance_pairs(w2cs: np.ndarray, num_select: int = 10) -> np.ndarray:
    """Nearest source views per reference view by camera-center distance
    (reference get_pairs fallback, dtu.py:115-124)."""
    c2ws = np.linalg.inv(w2cs)
    centers = c2ws[:, :3, 3]
    dists = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
    np.fill_diagonal(dists, 1e3)
    return np.argsort(dists, axis=1)[:, :num_select]


def read_pair_file(path: str, num_select: int = 10) -> np.ndarray:
    """MVSNet pair.txt parser (reference dtu.py:103-114)."""
    with open(path) as f:
        n = int(f.readline())
        pairs = [None] * n
        for _ in range(n):
            ref = int(f.readline().rstrip())
            src = [int(x) for x in f.readline().rstrip().split()[1::2]]
            pairs[ref] = np.array(src[:num_select])
    return np.array(pairs)
