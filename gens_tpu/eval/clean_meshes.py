"""Offline DTU_TEST mesh cleaning CLI (re-design of
/root/reference/evaluation/clean_meshes.py).

For each test scan: load the exported val mesh, keep faces whose vertices
project into the dilated object masks of the test views (1600x1200 frame,
disk-11 dilation, "strictly more than minimal_vis" views —
clean_meshes.py:144-162), then keep only faces seen as FIRST hits from >= 2
views' upscaled pixel grids (clean_meshes.py:189-295, native BVH instead of
pyembree) and drop components under 500 faces. The fixed view lists for ref
views 23 / 43 match clean_meshes.py:322-327.

Usage:
    python -m gens_tpu.eval.clean_meshes --root_dir DTU_TEST \
        --out_dir outputs/mesh --n_view 3 --set 0
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np

DTU_TEST_SCANS = (24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114,
                  118, 122)
VIEW_LIST_SET0 = (23, 24, 33, 22, 15, 34, 14, 32, 16, 35, 25)
VIEW_LIST_SET1 = (43, 33, 44, 42, 34, 32, 45, 23, 41, 24, 31)


def load_scan_cameras(root_dir: str, scan: int, view_ids):
    """DTU_TEST per-scan cameras_sphere.npz-style or MVSNet cams; here we
    read the standard DTU_TEST layout: ``scan{X}/cameras.npz`` with
    world_mat_{i} + scale_mat_{i} (IDR convention used by SparseNeuS-style
    DTU_TEST packages)."""
    import cv2

    cam_path = os.path.join(root_dir, f"scan{scan}", "cameras.npz")
    cams = np.load(cam_path)
    intrs, c2ws = [], []
    for vid in view_ids:
        P = (cams[f"world_mat_{vid}"] @ cams.get(
            f"scale_mat_{vid}", np.eye(4)))[:3, :4]
        out = cv2.decomposeProjectionMatrix(P)
        K = out[0] / out[0][2, 2]
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = out[1].T
        pose[:3, 3] = (out[2][:3] / out[2][3])[:, 0]
        intrs.append(K.astype(np.float32))
        c2ws.append(pose)
    return np.stack(intrs), np.stack(c2ws)


def load_masks(root_dir: str, scan: int, view_ids, hw=(1200, 1600)):
    from PIL import Image

    masks = []
    for vid in view_ids:
        for pattern in (f"scan{scan}/mask/{vid:03d}.png",
                        f"scan{scan}/mask/{vid:03d}.jpg"):
            path = os.path.join(root_dir, pattern)
            if os.path.exists(path):
                m = np.array(Image.open(path), np.float32)
                if m.ndim == 3:
                    m = m.mean(axis=-1)
                masks.append((m > 127.5).astype(np.float32))
                break
        else:
            raise FileNotFoundError(f"mask for scan{scan} view {vid}")
    return np.stack(masks)


def main(argv=None):
    from gens_tpu.mesh.clean import (clean_mesh_by_mask,
                                     clean_mesh_outside_frustum)
    from gens_tpu.mesh.ply import read_ply, write_ply

    p = argparse.ArgumentParser()
    p.add_argument("--root_dir", type=str, default="./DTU_TEST")
    p.add_argument("--out_dir", type=str, default="./outputs/mesh")
    p.add_argument("--n_view", type=int, default=3)
    p.add_argument("--set", type=int, default=0, choices=[0, 1])
    args = p.parse_args(argv)

    view_list = VIEW_LIST_SET0 if args.set == 0 else VIEW_LIST_SET1
    view_ids = list(view_list[: args.n_view])

    final_dir = os.path.join(args.out_dir, "final")
    os.makedirs(final_dir, exist_ok=True)

    for scan in DTU_TEST_SCANS:
        matches = glob(os.path.join(args.out_dir, f"*scan{scan}_epoch0.ply"))
        if not matches:
            print(f"scan{scan}: no mesh found, skipping")
            continue
        print(f"processing scan{scan}")
        verts, tris = read_ply(matches[0])
        intrs, c2ws = load_scan_cameras(args.root_dir, scan, view_ids)
        masks = load_masks(args.root_dir, scan, view_ids)

        verts, tris = clean_mesh_by_mask(
            verts, tris, masks, intrs, c2ws, min_nb_visible=1,
            dilate_radius=11)
        if len(tris):
            verts, tris = clean_mesh_outside_frustum(
                verts, tris, intrs, c2ws, masks.shape[1:3], upscale=2,
                min_component=500)
        write_ply(os.path.join(final_dir, f"scan{scan}.ply"), verts, tris)
        print(f"  -> {len(verts)} verts, {len(tris)} faces")


if __name__ == "__main__":
    main()
