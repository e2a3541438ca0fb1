"""BlendedMVS dataset pipeline (re-design of /root/reference/datasets/bmvs.py
and bmvs_finetune.py) for cross-dataset generalization evaluation.

Differences from DTU (SURVEY.md §2.2): per-scene ``cams/pair.txt`` +
``blended_images/%08d_masked.jpg`` images, intrinsics calibrated at 768x576
(bmvs.py:182-183), masks derived from rendered depth >= depth_min
(bmvs.py:198-207), no light indices and no pseudo supervision.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from gens_tpu.config import DatasetConfig
from gens_tpu.data.cameras import (
    frustum_union_scale_mat,
    normalize_cameras,
    pixels_to_rays,
    read_mvsnet_cam,
    read_pfm,
)
from gens_tpu.data.dtu import _resize


class BMVSDataset:
    def __init__(self, cfg: DatasetConfig, mode: str,
                 rng: Optional[np.random.RandomState] = None):
        self.cfg = cfg
        self.mode = mode
        self.rng = rng or np.random.RandomState(0)
        self.data_dir = cfg.data_dir
        self.img_hw = tuple(cfg.img_hw)

        if cfg.scene is not None:
            self.scenes = list(cfg.scene)
        elif cfg.split is not None:
            with open(cfg.split) as f:
                self.scenes = [l.strip() for l in f if l.strip()]
        else:
            raise ValueError("no scenes configured")
        self.metas = self._build_list()

    def _pair_lines(self, scene):
        with open(os.path.join(self.data_dir, scene, "cams", "pair.txt")) as f:
            return [l.rstrip() for l in f.readlines()]

    def _build_list(self):
        metas = []
        for scene in self.scenes:
            lines = self._pair_lines(scene)
            n = int(lines[0])
            refs = (list(self.cfg.ref_view) if self.cfg.ref_view
                    else list(range(n)))
            for ref in refs:
                src = [int(x) for x in lines[2 * ref + 2].split()[1::2]]
                metas.append((scene, ref, src))
        return metas

    def __len__(self):
        return len(self.metas)

    def _read_cam(self, scene, vid):
        path = os.path.join(self.data_dir, scene,
                            "cams/{:0>8}_cam.txt".format(vid))
        intr, w2c, nf = read_mvsnet_cam(path, self.cfg.interval_scale,
                                        self.cfg.num_interval)
        intr = intr.copy()
        intr[0] *= self.img_hw[1] / 768.0
        intr[1] *= self.img_hw[0] / 576.0
        return intr, w2c, nf

    def _read_img(self, scene, vid):
        from PIL import Image

        path = os.path.join(self.data_dir, scene, "blended_images",
                            "%08d_masked.jpg" % vid)
        img = np.array(Image.open(path), dtype=np.float32)
        return _resize(img, self.img_hw) / 256.0

    def _read_depth_mask(self, scene, vid, depth_min):
        path = os.path.join(self.data_dir, scene, "rendered_depth_maps",
                            "%08d.pfm" % vid)
        depth = read_pfm(path).astype(np.float32)
        mask = (depth >= depth_min).astype(np.float32)
        return (_resize(depth, self.img_hw), _resize(mask, self.img_hw))

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        scan, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.cfg.num_src_view]
        H, W = self.img_hw

        imgs, intrs, w2cs, near_fars, depths, masks = [], [], [], [], [], []
        for vid in view_ids:
            intr, w2c, nf = self._read_cam(scan, vid)
            imgs.append(self._read_img(scan, vid))
            intrs.append(intr)
            w2cs.append(w2c)
            near_fars.append(nf)
            d, m = self._read_depth_mask(scan, vid, nf[0])
            depths.append(d)
            masks.append(m)

        w2c_ref_inv = np.linalg.inv(w2cs[0])
        w2cs = [w2c @ w2c_ref_inv for w2c in w2cs]

        scale_mat, scale_factor = frustum_union_scale_mat(
            self.img_hw, intrs, w2cs, near_fars, factor=self.cfg.factor)
        new_intrs, c2ws, new_near_fars = normalize_cameras(
            intrs, w2cs, scale_mat)
        depths = [d * scale_factor for d in depths]

        imgs = np.stack(imgs).astype(np.float32)
        masks = np.stack(masks).astype(np.float32)
        depths = np.stack(depths).astype(np.float32)

        outputs = {
            "imgs": imgs,
            "intrs": new_intrs.astype(np.float32),
            "c2ws": np.asarray(c2ws, np.float32),
            "masks": masks,
            "scale_mat": (w2c_ref_inv @ scale_mat).astype(np.float32),
            "view_ids": np.asarray(view_ids, np.int64),
            "scene": scan,
            "file_name": f"{scan}_view{ref_view}",
        }

        if self.mode == "train":
            from gens_tpu.data.dtu import DTUDataset

            px, py = DTUDataset._sample_train_pixels(self, masks[0])
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
        return outputs

    # reuse the DTU pixel sampler
    _sample_train_pixels = None  # set below


from gens_tpu.data.dtu import DTUDataset as _DTU  # noqa: E402

BMVSDataset._sample_train_pixels = _DTU._sample_train_pixels


class BMVSFinetuneDataset:
    """Per-scene BMVS fine-tuning (reference bmvs_finetune.py): fixed ref
    view + pair sources, everything preloaded; masks from the masked jpgs
    (bmvs_finetune.py:100-106); no pseudo supervision."""

    def __init__(self, cfg: DatasetConfig,
                 rng: Optional[np.random.RandomState] = None):
        self.cfg = cfg
        self.rng = rng or np.random.RandomState(0)
        self.data_dir = cfg.data_dir
        self.img_hw = tuple(cfg.img_hw)
        assert cfg.scene and cfg.ref_view
        self.scene = cfg.scene[0]
        self.ref_view = int(cfg.ref_view[0])

        import dataclasses

        base_cfg = dataclasses.replace(cfg, scene=(self.scene,),
                                       ref_view=(self.ref_view,))
        base = BMVSDataset(base_cfg, "finetune", rng=self.rng)
        scan, ref, srcs = base.metas[0]
        self.view_ids = [ref] + srcs[: cfg.num_views - 1]
        self.num_views = len(self.view_ids)

        H, W = self.img_hw
        imgs, intrs, w2cs, near_fars, masks = [], [], [], [], []
        from PIL import Image

        for vid in self.view_ids:
            intr, w2c, nf = base._read_cam(scan, vid)
            # unmasked image + mask from the masked jpg (bmvs_finetune.py)
            path = os.path.join(self.data_dir, scan, "blended_images",
                                "{:0>8}.jpg".format(vid))
            if not os.path.exists(path):
                path = os.path.join(self.data_dir, scan, "blended_images",
                                    "{:0>8}_masked.jpg".format(vid))
            img = _resize(np.array(Image.open(path), np.float32),
                          self.img_hw) / 256.0
            mpath = os.path.join(self.data_dir, scan, "blended_images",
                                 "{:0>8}_masked.jpg".format(vid))
            m = _resize(np.array(Image.open(mpath), np.float32), self.img_hw)
            mask = (m.mean(axis=-1) > 0).astype(np.float32)
            imgs.append(img)
            intrs.append(intr)
            w2cs.append(w2c)
            near_fars.append(nf)
            masks.append(mask)

        w2c_ref_inv = np.linalg.inv(w2cs[0])
        w2cs = [w2c @ w2c_ref_inv for w2c in w2cs]
        scale_mat, scale_factor = frustum_union_scale_mat(
            self.img_hw, intrs, w2cs, near_fars, factor=cfg.factor)
        new_intrs, c2ws, new_near_fars = normalize_cameras(
            intrs, w2cs, scale_mat)

        self.imgs = np.stack(imgs).astype(np.float32)
        self.masks = np.stack(masks).astype(np.float32)
        self.norm_intrs = new_intrs.astype(np.float32)
        self.c2ws = c2ws.astype(np.float32)
        self.new_near_fars = new_near_fars
        self.scale_mat = (w2c_ref_inv @ scale_mat).astype(np.float32)
        self.pseudo_cloud = None

    def get_all_images(self):
        return {"imgs": self.imgs, "intrs": self.norm_intrs,
                "c2ws": self.c2ws}

    def get_random_rays(self, vid: int):
        H, W = self.img_hw
        n = self.cfg.n_rays
        px = self.rng.randint(0, W, size=n).astype(np.float32)
        py = self.rng.randint(0, H, size=n).astype(np.float32)
        ix, iy = px.astype(np.int64), py.astype(np.int64)
        order = [vid] + [i for i in range(self.num_views) if i != vid]
        rays_o, rays_d = pixels_to_rays(px, py, self.norm_intrs[vid],
                                        self.c2ws[vid])
        return {
            "imgs": self.imgs[order],
            "intrs": self.norm_intrs[order],
            "c2ws": self.c2ws[order],
            "view_ids": np.asarray(order, np.int64),
            "rays_o": rays_o,
            "rays_d": rays_d,
            "near": self.new_near_fars[vid, :1].reshape(1, 1),
            "far": self.new_near_fars[vid, 1:].reshape(1, 1),
            "color": self.imgs[vid][iy, ix],
            "mask": self.masks[vid][iy, ix],
        }

    def get_rays_at(self, vid: int):
        H, W = self.img_hw
        stride = self.cfg.val_res_level
        tx = np.linspace(0, W - 1, W // stride, dtype=np.float32)
        ty = np.linspace(0, H - 1, H // stride, dtype=np.float32)
        py, px = np.meshgrid(ty, tx, indexing="ij")
        px, py = px.ravel(), py.ravel()
        ix, iy = px.astype(np.int64), py.astype(np.int64)
        order = [vid] + [i for i in range(self.num_views) if i != vid]
        rays_o, rays_d = pixels_to_rays(px, py, self.norm_intrs[vid],
                                        self.c2ws[vid])
        return {
            "imgs": self.imgs[order],
            "intrs": self.norm_intrs[order],
            "c2ws": self.c2ws[order],
            "view_ids": np.asarray(order, np.int64),
            "rays_o": rays_o,
            "rays_d": rays_d,
            "near": self.new_near_fars[vid, :1].reshape(1, 1),
            "far": self.new_near_fars[vid, 1:].reshape(1, 1),
            "color": self.imgs[vid][iy, ix],
            "mask": self.masks[vid][iy, ix],
            "masks": self.masks,
            "bound_min": np.array([-1, -1, -1], np.float32),
            "bound_max": np.array([1, 1, 1], np.float32),
            "hw": np.array([H // stride, W // stride], np.int64),
            "scale_mat": self.scale_mat,
            "scene": self.scene,
        }
