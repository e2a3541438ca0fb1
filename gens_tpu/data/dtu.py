"""DTU dataset pipeline (host-side numpy -> device arrays).

Re-design of /root/reference/datasets/dtu.py (train/val) and
dtu_finetune.py. Behavior parity with the reference's sampling and geometry:

* metas = scan x light x ref_view (dtu.py:127-160); train picks
  ``num_src_view`` random sources out of the 6 nearest pair entries
  (dtu.py:276-280), val takes the top ones.
* world frame re-centered at the ref camera (``w2c @ w2c_ref_inv``,
  dtu.py:316), frustum-union scale matrix into the unit sphere
  (dtu.py:193-229,324), P-matrix re-decomposition (dtu.py:326-341).
* train ray batch: 3/4 from mask-valid pixels + 1/4 uniform
  (dtu.py:367-381); val: full stride-``val_res_level`` grid.
* pseudo-depth supervision + 2048 back-projected pseudo points
  (dtu.py:305,322,406-419; fixed pseudo scale dtu.py:99).

Outputs are channels-last numpy arrays matching gens_tpu conventions:
imgs (V, H, W, 3), intrs (V, 3, 3), c2ws (V, 4, 4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gens_tpu.config import DatasetConfig
from gens_tpu.data.cameras import (
    frustum_union_scale_mat,
    normalize_cameras,
    pixels_to_rays,
    pose_distance_pairs,
    read_mvsnet_cam,
    read_pair_file,
    read_pfm,
)

# fixed pseudo-depth scale of the released pseudo labels (dtu.py:99)
PSEUDO_SCALE = 0.0037506045743823813

SPLIT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "dtu_split")


def load_split(name: str) -> List[str]:
    with open(os.path.join(SPLIT_DIR, name + ".txt")) as f:
        return [l.strip() for l in f if l.strip()]


def _resize(img: np.ndarray, hw) -> np.ndarray:
    import cv2

    return cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_NEAREST)


class DTUDataset:
    """Map-style dataset; ``__getitem__`` returns a numpy input dict."""

    total_views = 49

    def __init__(self, cfg: DatasetConfig, mode: str, rng: Optional[np.random.RandomState] = None):
        self.cfg = cfg
        self.mode = mode
        self.rng = rng or np.random.RandomState(0)
        self.data_dir = cfg.data_dir
        self.img_hw = tuple(cfg.img_hw)

        self.intrs, self.w2cs, self.near_fars = self._read_cams()
        self.pairs = self._get_pairs()
        self.metas = self._build_list()

    # -- setup -------------------------------------------------------------

    def _read_cams(self):
        intrs, w2cs, near_fars = [], [], []
        for vid in range(self.total_views):
            path = os.path.join(self.data_dir,
                                "Cameras/{:0>8}_cam.txt".format(vid))
            intr, w2c, nf = read_mvsnet_cam(
                path, self.cfg.interval_scale, self.cfg.num_interval)
            # DTU cams are calibrated at 1600x1200 (dtu.py:184-185)
            intr = intr.copy()
            intr[0] *= self.img_hw[1] / 1600.0
            intr[1] *= self.img_hw[0] / 1200.0
            intrs.append(intr)
            w2cs.append(w2c)
            near_fars.append(nf)
        return intrs, w2cs, near_fars

    def _get_pairs(self):
        pair_file = os.path.join(self.data_dir, "Cameras/pair.txt")
        if os.path.exists(pair_file):
            return read_pair_file(pair_file)
        return pose_distance_pairs(np.stack(self.w2cs))

    def _build_list(self):
        if self.cfg.scene is not None:
            scans = list(self.cfg.scene)
        elif self.cfg.split is not None:
            scans = load_split(self.cfg.split)
        else:
            raise ValueError("no scenes configured")
        light_idxs = (list(self.cfg.light_idx) if self.cfg.light_idx
                      else list(range(7)))
        ref_views = (list(self.cfg.ref_view) if self.cfg.ref_view
                     else list(range(self.total_views)))
        metas = []
        for scan in scans:
            for ref_view in ref_views:
                for light in light_idxs:
                    metas.append((scan, light, ref_view))
        return metas

    def __len__(self):
        return len(self.metas)

    # -- file readers ------------------------------------------------------

    def _img_path(self, scan, vid, light):
        suffix = "r7000" if vid > 48 else "r5000"
        return os.path.join(
            self.data_dir,
            f"Rectified_raw/{scan}/rect_{vid + 1:0>3}_{light}_{suffix}.png")

    def _read_img(self, path):
        from PIL import Image

        img = np.array(Image.open(path), dtype=np.float32)
        return _resize(img, self.img_hw) / 256.0

    def _read_mask(self, scan, vid):
        from PIL import Image

        path = os.path.join(
            self.data_dir, f"Depths_raw/{scan}/depth_visual_{vid:0>4}.png")
        m = np.array(Image.open(path), dtype=np.float32)
        m = (_resize(m, self.img_hw) > 10).astype(np.float32)
        if m.ndim > 2:
            m = (m.mean(axis=-1) > 0).astype(np.float32)
        return m

    def _read_depth(self, scan, vid):
        path = os.path.join(
            self.data_dir, f"Depths_raw/{scan}/depth_map_{vid:0>4}.pfm")
        return _resize(read_pfm(path).astype(np.float32), self.img_hw)

    def _read_pseudo_depth(self, scan, vid):
        path = os.path.join(
            self.data_dir, f"pseudo_depths/{scan}/{vid}_epoch0.npy")
        if not os.path.exists(path):
            return None
        d = np.load(path).astype(np.float32) / PSEUDO_SCALE
        return _resize(d, self.img_hw)

    # -- item --------------------------------------------------------------

    def select_views(self, ref_view: int) -> List[int]:
        pairs = list(self.pairs[ref_view])
        n = min(self.cfg.num_src_view, len(pairs))
        if self.mode == "train":
            src = list(self.rng.choice(pairs[:6], size=n, replace=False))
        else:
            src = pairs[:n]
        return [ref_view] + [int(v) for v in src]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        scan, light, ref_view = self.metas[idx]
        view_ids = self.select_views(ref_view)
        H, W = self.img_hw

        w2c_ref_inv = np.linalg.inv(self.w2cs[ref_view])

        imgs, intrs, w2cs, near_fars, masks, depths = [], [], [], [], [], []
        pseudo_depth_ref = None
        for i, vid in enumerate(view_ids):
            imgs.append(self._read_img(self._img_path(scan, vid, light)))
            intrs.append(self.intrs[vid])
            w2cs.append(self.w2cs[vid] @ w2c_ref_inv)  # ref-centered world
            near_fars.append(self.near_fars[vid])
            masks.append(self._read_mask(scan, vid))
            depths.append(self._read_depth(scan, vid))
            if i == 0 and self.mode == "train":
                pseudo_depth_ref = self._read_pseudo_depth(scan, vid)

        scale_mat, scale_factor = frustum_union_scale_mat(
            self.img_hw, intrs, w2cs, near_fars, factor=self.cfg.factor)
        new_intrs, c2ws, new_near_fars = normalize_cameras(
            intrs, w2cs, scale_mat)
        depths = [d * scale_factor for d in depths]
        if pseudo_depth_ref is not None:
            pseudo_depth_ref = pseudo_depth_ref * scale_factor

        imgs = np.stack(imgs).astype(np.float32)
        masks = np.stack(masks).astype(np.float32)
        depths = np.stack(depths).astype(np.float32)

        outputs = {
            "imgs": imgs,
            "intrs": new_intrs.astype(np.float32),
            "c2ws": c2ws.astype(np.float32),
            "masks": masks,
            "scale_mat": (w2c_ref_inv @ scale_mat).astype(np.float32),
            "view_ids": np.asarray(view_ids, np.int64),
            "scene": scan,
            "file_name": f"{scan}_view{ref_view}_light{light}",
        }

        if self.mode == "train":
            px, py = self._sample_train_pixels(masks[0])
        else:
            stride = self.cfg.val_res_level
            tx = np.linspace(0, W - 1, W // stride, dtype=np.float32)
            ty = np.linspace(0, H - 1, H // stride, dtype=np.float32)
            py, px = np.meshgrid(ty, tx, indexing="ij")
            px, py = px.ravel(), py.ravel()
            outputs.update({
                "bound_min": np.array([-1, -1, -1], np.float32),
                "bound_max": np.array([1, 1, 1], np.float32),
                "hw": np.array([H // stride, W // stride], np.int64),
            })

        ix, iy = px.astype(np.int64), py.astype(np.int64)
        outputs["color"] = imgs[0][iy, ix]
        outputs["depth"] = depths[0][iy, ix]
        outputs["mask"] = masks[0][iy, ix]
        rays_o, rays_d = pixels_to_rays(px, py, new_intrs[0], c2ws[0])
        outputs["rays_o"] = rays_o
        outputs["rays_d"] = rays_d
        outputs["near"] = new_near_fars[0, :1].reshape(1, 1)
        outputs["far"] = new_near_fars[0, 1:].reshape(1, 1)
        outputs["depth_ref"] = depths[0]
        outputs["mask_ref"] = masks[0]

        if pseudo_depth_ref is not None:
            outputs["pseudo_depth"] = pseudo_depth_ref[iy, ix]
            outputs["pseudo_depth_ref"] = pseudo_depth_ref
            pts = self._pseudo_points(pseudo_depth_ref, masks[0],
                                      new_intrs[0], c2ws[0])
            if pts is not None:
                outputs["pseudo_pts"] = pts

        return outputs

    def _sample_train_pixels(self, mask):
        """3/4 mask-valid + 1/4 uniform ray pixels (dtu.py:367-381)."""
        H, W = self.img_hw
        n = self.cfg.n_rays
        n_uniform = n // 4
        ys, xs = np.nonzero(mask > 0.5)
        if len(xs) == 0:
            xs = np.arange(W).repeat(H)
            ys = np.tile(np.arange(H), W)
        sel = self.rng.randint(0, len(xs), size=n - n_uniform)
        px = np.concatenate([
            xs[sel].astype(np.float32),
            self.rng.randint(0, W, size=n_uniform).astype(np.float32)])
        py = np.concatenate([
            ys[sel].astype(np.float32),
            self.rng.randint(0, H, size=n_uniform).astype(np.float32)])
        return px, py

    def _pseudo_points(self, pseudo_depth, mask, intr, c2w):
        """Back-project ``n_pseudo_pts`` random pseudo-depth pixels to world
        points (dtu.py:406-419)."""
        H, W = self.img_hw
        valid = (pseudo_depth > 0) & (mask > 0)
        if valid.sum() <= 100:
            return None
        ys, xs = np.nonzero(valid)
        sel = self.rng.randint(0, len(xs), size=self.cfg.n_pseudo_pts)
        x = xs[sel].astype(np.float32)
        y = ys[sel].astype(np.float32)
        d = pseudo_depth[ys[sel], xs[sel]]
        cam = np.stack([x, y, np.ones_like(x)], axis=0) * d[None]
        cam = np.linalg.inv(intr) @ cam
        homo = np.concatenate([cam, np.ones_like(cam[:1])], axis=0)
        world = (c2w @ homo)[:3]
        return world.T.astype(np.float32)
