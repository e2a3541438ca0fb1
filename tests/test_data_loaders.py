"""Fixture tests for the real DTU/BMVS file pipelines.

Round-2 verdict: the data loaders were the one subsystem never executed (no
DTU/BMVS bytes exist in this environment). These tests build tiny on-disk
dataset trees in the exact formats the reference consumes
(/root/reference/datasets/dtu.py:36-71,162-229,273-437 and bmvs.py:182-220)
— MVSNet cam txts, pair.txt, PFM depth maps, PNG/JPG images, pseudo-depth
.npy — and run every dataset class end-to-end: parsing, intrinsics rescale,
P-redecomposition, frustum-union scale mat, 3/4+1/4 ray sampling,
pseudo-depth/pts back-projection, val grids, and the finetune variants.
"""

import os

import numpy as np
import pytest

from gens_tpu.config import DatasetConfig
from gens_tpu.data.bmvs import BMVSDataset, BMVSFinetuneDataset
from gens_tpu.data.cameras import read_mvsnet_cam, read_pfm
from gens_tpu.data.dtu import PSEUDO_SCALE, DTUDataset
from gens_tpu.data.dtu_finetune import DTUFinetuneDataset

# -- fixture writers ---------------------------------------------------------

N_VIEWS = 8          # views with image/depth data (cam files cover all 49)
SRC_HW = (24, 32)    # on-disk image resolution (loaders resize anyway)
IMG_HW = (48, 64)    # target resolution handed to the datasets


def circle_pose(i, n, radius=600.0, height=350.0):
    """w2c of a camera on a circle looking at the origin (y-down convention
    like DTU: camera +z into the scene)."""
    ang = 2 * np.pi * i / max(n, 1) * 0.25  # quarter arc: views overlap
    center = np.array([radius * np.sin(ang), height,
                       -radius * np.cos(ang)], np.float64)
    forward = -center / np.linalg.norm(center)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    up2 = np.cross(forward, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, forward, center
    return np.linalg.inv(c2w)


def write_cam_txt(path, w2c, intr, depth_min=400.0, depth_interval=2.5):
    """MVSNet camera file (reference dtu.py:162-191 format)."""
    lines = ["extrinsic"]
    for r in range(4):
        lines.append(" ".join(f"{w2c[r, c]:.6f}" for c in range(4)))
    lines += ["", "intrinsic"]
    for r in range(3):
        lines.append(" ".join(f"{intr[r, c]:.6f}" for c in range(3)))
    lines += ["", f"{depth_min} {depth_interval}"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_pair_txt(path, n_total, n_data):
    """pair.txt: per ref view, 10 (src, score) entries; sources are the
    nearest data views so train sampling stays within the fixture."""
    with open(path, "w") as f:
        f.write(f"{n_total}\n")
        for ref in range(n_total):
            srcs = [v for v in range(n_data) if v != ref % n_data][:10]
            while len(srcs) < 10:
                srcs.append(srcs[-1])
            f.write(f"{ref}\n")
            f.write("10 " + " ".join(
                f"{s} {100.0 - k}" for k, s in enumerate(srcs)) + "\n")


def write_pfm(path, data):
    """Writer matching read_pfm (reference dtu.py:36-71): 'Pf', dims,
    negative scale = little-endian, rows bottom-up."""
    h, w = data.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        np.flipud(data.astype("<f4")).tofile(f)


def write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture(scope="module")
def dtu_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu"))
    os.makedirs(os.path.join(root, "Cameras"))
    intr = np.array([[1400.0, 0, 800.0], [0, 1400.0, 600.0], [0, 0, 1.0]])
    rng = np.random.RandomState(0)
    for vid in range(DTUDataset.total_views):
        w2c = circle_pose(vid % N_VIEWS, N_VIEWS)
        write_cam_txt(os.path.join(root, f"Cameras/{vid:08d}_cam.txt"),
                      w2c, intr)
    write_pair_txt(os.path.join(root, "Cameras/pair.txt"),
                   DTUDataset.total_views, N_VIEWS)

    scan = "scan1"
    os.makedirs(os.path.join(root, f"Rectified_raw/{scan}"))
    os.makedirs(os.path.join(root, f"Depths_raw/{scan}"))
    os.makedirs(os.path.join(root, f"pseudo_depths/{scan}"))
    h, w = SRC_HW
    for vid in range(N_VIEWS):
        img = rng.randint(0, 255, (h, w, 3))
        for light in (2, 3):
            write_png(os.path.join(
                root, f"Rectified_raw/{scan}/"
                f"rect_{vid + 1:0>3}_{light}_r5000.png"), img)
        # mask: central blob visible (border invisible)
        mask = np.zeros((h, w))
        mask[4:-4, 6:-6] = 255
        write_png(os.path.join(
            root, f"Depths_raw/{scan}/depth_visual_{vid:0>4}.png"), mask)
        depth = np.full((h, w), 600.0, np.float32) + rng.rand(h, w)
        write_pfm(os.path.join(
            root, f"Depths_raw/{scan}/depth_map_{vid:0>4}.pfm"), depth)
        np.save(os.path.join(root, f"pseudo_depths/{scan}/{vid}_epoch0.npy"),
                (depth * PSEUDO_SCALE).astype(np.float32))
    return root, scan


@pytest.fixture(scope="module")
def bmvs_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bmvs"))
    scene = "5a0sceneid"
    os.makedirs(os.path.join(root, scene, "cams"))
    os.makedirs(os.path.join(root, scene, "blended_images"))
    os.makedirs(os.path.join(root, scene, "rendered_depth_maps"))
    intr = np.array([[700.0, 0, 384.0], [0, 700.0, 288.0], [0, 0, 1.0]])
    rng = np.random.RandomState(1)
    h, w = SRC_HW
    for vid in range(N_VIEWS):
        w2c = circle_pose(vid, N_VIEWS)
        write_cam_txt(os.path.join(root, scene, f"cams/{vid:08d}_cam.txt"),
                      w2c, intr)
        img = rng.randint(0, 255, (h, w, 3))
        write_png(os.path.join(root, scene,
                               "blended_images/%08d_masked.jpg" % vid), img)
        depth = np.full((h, w), 600.0, np.float32)
        depth[:3] = 0.0  # below depth_min -> masked out
        write_pfm(os.path.join(root, scene,
                               "rendered_depth_maps/%08d.pfm" % vid), depth)
    write_pair_txt(os.path.join(root, scene, "cams/pair.txt"),
                   N_VIEWS, N_VIEWS)
    return root, scene


def dtu_cfg(root, scan, **kw):
    base = dict(dataset_name="dtu", data_dir=root, split=None, scene=(scan,),
                light_idx=(3,), ref_view=(0,), num_src_view=2,
                img_hw=IMG_HW, n_rays=64, n_pseudo_pts=128)
    base.update(kw)
    return DatasetConfig(**base)


# -- format parsers ----------------------------------------------------------


def test_pfm_roundtrip(tmp_path):
    data = np.arange(12, dtype=np.float32).reshape(3, 4) * 0.5
    path = str(tmp_path / "d.pfm")
    write_pfm(path, data)
    out = read_pfm(path)
    np.testing.assert_array_equal(out, data)


def test_mvsnet_cam_parse(tmp_path):
    intr = np.array([[1400.0, 0, 800.0], [0, 1400.0, 600.0], [0, 0, 1.0]])
    w2c = circle_pose(1, 8)
    path = str(tmp_path / "cam.txt")
    write_cam_txt(path, w2c, intr, depth_min=425.0, depth_interval=2.5)
    i2, e2, (dmin, dmax) = read_mvsnet_cam(path, interval_scale=1.06,
                                           num_interval=192)
    np.testing.assert_allclose(i2, intr, atol=1e-4)
    np.testing.assert_allclose(e2, w2c, atol=1e-4)
    assert dmin == 425.0
    assert abs(dmax - (425.0 + 2.5 * 1.06 * 192)) < 1e-3


# -- DTU train/val -----------------------------------------------------------


def test_dtu_train_item(dtu_tree):
    root, scan = dtu_tree
    ds = DTUDataset(dtu_cfg(root, scan), "train",
                    rng=np.random.RandomState(0))
    assert len(ds) == 1  # 1 scan x 1 light x 1 ref view
    item = ds[0]

    V = 3  # ref + num_src_view
    H, W = IMG_HW
    assert item["imgs"].shape == (V, H, W, 3)
    assert item["intrs"].shape == (V, 3, 3)
    assert item["c2ws"].shape == (V, 4, 4)
    assert item["view_ids"][0] == 0
    assert item["rays_o"].shape == (64, 3)
    np.testing.assert_allclose(
        np.linalg.norm(item["rays_d"], axis=-1), 1.0, atol=1e-5)

    # intrinsics rescaled from the 1600x1200 calibration frame: cx sits at
    # the same relative position after P-redecomposition
    assert abs(item["intrs"][0, 0, 2] - 800.0 * W / 1600.0) < 1.0
    # cameras normalized into the unit-sphere frame: ref camera ~unit-ish
    # distance from origin, near/far bracket it (dtu.py:337-341)
    dist = np.linalg.norm(item["c2ws"][0, :3, 3])
    assert 0.1 < dist < 10.0
    assert item["near"][0, 0] == pytest.approx(0.95 * (dist - 1.0), rel=1e-3)
    assert item["far"][0, 0] == pytest.approx(1.05 * (dist + 1.0), rel=1e-3)

    # 3/4 of the ray pixels come from mask-valid positions
    n_masked = 64 - 64 // 4
    assert item["mask"][:n_masked].min() > 0.5

    # pseudo supervision present and back-projection-consistent: pseudo_pts
    # projected into the ref view land inside the image with depth ~ the
    # (scaled) pseudo depth map
    assert item["pseudo_pts"].shape == (128, 3)
    w2c0 = np.linalg.inv(item["c2ws"][0])
    cam = item["pseudo_pts"] @ w2c0[:3, :3].T + w2c0[:3, 3]
    uvw = cam @ item["intrs"][0].T
    xy = uvw[:, :2] / uvw[:, 2:]
    assert (xy[:, 0] > -1).all() and (xy[:, 0] < W).all()
    assert (xy[:, 1] > -1).all() and (xy[:, 1] < H).all()
    iy = np.clip(np.round(xy[:, 1]).astype(int), 0, H - 1)
    ix = np.clip(np.round(xy[:, 0]).astype(int), 0, W - 1)
    np.testing.assert_allclose(cam[:, 2],
                               item["pseudo_depth_ref"][iy, ix], rtol=0.1)


def test_dtu_projection_consistency(dtu_tree):
    """P-redecomposition parity: K_new @ w2c_new must project points to the
    same pixels as the original scaled K @ (w2c @ w2c_ref_inv @ scale_mat)
    (the reference's load_K_Rt_from_P path, dtu.py:326-341)."""
    root, scan = dtu_tree
    ds = DTUDataset(dtu_cfg(root, scan), "val", rng=np.random.RandomState(0))
    item = ds[0]
    # original P of view 1 in the normalized frame
    vid = int(item["view_ids"][1])
    K4 = np.eye(4, dtype=np.float64)
    intr = ds.intrs[vid].copy()
    K4[:3, :3] = intr
    w2c_ref_inv = np.linalg.inv(ds.w2cs[int(item["view_ids"][0])])
    # scale_mat output is pre-composed with w2c_ref_inv (dtu.py:324)
    P_orig = (K4 @ ds.w2cs[vid] @ item["scale_mat"].astype(np.float64))[:3]
    # new decomposition
    K_new = item["intrs"][1].astype(np.float64)
    w2c_new = np.linalg.inv(item["c2ws"][1].astype(np.float64))
    pts = np.random.RandomState(3).randn(32, 3) * 0.3
    homo = np.concatenate([pts, np.ones((32, 1))], axis=1)
    uv1 = (homo @ P_orig.T)
    uv1 = uv1[:, :2] / uv1[:, 2:]
    cam2 = pts @ w2c_new[:3, :3].T + w2c_new[:3, 3]
    uv2 = cam2 @ K_new[:3, :3].T
    uv2 = uv2[:, :2] / uv2[:, 2:]
    np.testing.assert_allclose(uv1, uv2, atol=1e-2)


def test_dtu_val_item(dtu_tree):
    root, scan = dtu_tree
    cfg = dtu_cfg(root, scan, val_res_level=4)
    ds = DTUDataset(cfg, "val", rng=np.random.RandomState(0))
    item = ds[0]
    H, W = IMG_HW
    n = (H // 4) * (W // 4)
    assert item["rays_o"].shape == (n, 3)
    assert tuple(item["hw"]) == (H // 4, W // 4)
    assert "pseudo_depth" not in item  # train-only
    np.testing.assert_array_equal(item["bound_min"], [-1, -1, -1])
    # val sources = top pair entries, deterministic
    ds2 = DTUDataset(cfg, "val", rng=np.random.RandomState(7))
    np.testing.assert_array_equal(item["view_ids"], ds2[0]["view_ids"])


def test_dtu_light_and_meta_expansion(dtu_tree):
    root, scan = dtu_tree
    cfg = dtu_cfg(root, scan, light_idx=(2, 3), ref_view=(0, 1))
    ds = DTUDataset(cfg, "train", rng=np.random.RandomState(0))
    assert len(ds) == 4  # 1 scan x 2 lights x 2 ref views
    scenes = {m[0] for m in ds.metas}
    lights = {m[1] for m in ds.metas}
    assert scenes == {scan} and lights == {2, 3}
    item = ds[2]  # exercises light 2 image paths
    assert item["imgs"].shape[0] == 3


# -- DTU finetune ------------------------------------------------------------


def test_dtu_finetune_dataset(dtu_tree):
    root, scan = dtu_tree
    cfg = dtu_cfg(root, scan, num_views=3, val_res_level=8)
    ds = DTUFinetuneDataset(cfg, rng=np.random.RandomState(0))
    assert ds.num_views == 3
    assert ds.view_ids[0] == 0

    all_imgs = ds.get_all_images()
    assert all_imgs["imgs"].shape == (3, *IMG_HW, 3)

    # rotating-view batches: view v leads the view_ids order
    # (dtu_finetune.py:276)
    b1 = ds.get_random_rays(1)
    np.testing.assert_array_equal(b1["view_ids"], [1, 0, 2])
    assert b1["rays_o"].shape == (64, 3)
    assert b1["pseudo_pts"].shape == (128, 3)
    # rays originate at view 1's camera center
    np.testing.assert_allclose(b1["rays_o"][0], ds.c2ws[1][:3, 3], atol=1e-6)

    v = ds.get_rays_at(0)
    H, W = IMG_HW
    assert v["rays_o"].shape == ((H // 8) * (W // 8), 3)
    assert v["masks"].shape == (3, H, W)
    assert v["scene"] == scan


# -- BMVS --------------------------------------------------------------------


def test_bmvs_train_and_val(bmvs_tree):
    root, scene = bmvs_tree
    cfg = DatasetConfig(dataset_name="bmvs", data_dir=root, split=None,
                        scene=(scene,), ref_view=(0,), num_src_view=2,
                        img_hw=IMG_HW, n_rays=64, val_res_level=4)
    ds = BMVSDataset(cfg, "train", rng=np.random.RandomState(0))
    assert len(ds) == 1
    item = ds[0]
    H, W = IMG_HW
    assert item["imgs"].shape == (3, H, W, 3)
    # mask comes from rendered depth >= depth_min: the zeroed top rows of
    # the fixture depth maps are invisible
    assert item["mask_ref"][0].max() == 0.0
    assert item["mask_ref"][-1].max() == 1.0
    # ray batch pixels honor the mask for the 3/4 portion
    n_masked = 64 - 64 // 4
    assert item["mask"][:n_masked].min() > 0.5
    np.testing.assert_allclose(
        np.linalg.norm(item["rays_d"], axis=-1), 1.0, atol=1e-5)
    assert "pseudo_depth" not in item  # BMVS has no pseudo supervision

    val = BMVSDataset(cfg, "val", rng=np.random.RandomState(0))[0]
    assert val["rays_o"].shape == ((H // 4) * (W // 4), 3)
    assert tuple(val["hw"]) == (H // 4, W // 4)


def test_bmvs_ref_view_expansion(bmvs_tree):
    root, scene = bmvs_tree
    cfg = DatasetConfig(dataset_name="bmvs", data_dir=root, split=None,
                        scene=(scene,), ref_view=None, num_src_view=2,
                        img_hw=IMG_HW, n_rays=64)
    ds = BMVSDataset(cfg, "val", rng=np.random.RandomState(0))
    assert len(ds) == N_VIEWS  # one meta per ref view from pair.txt
    refs = [m[1] for m in ds.metas]
    assert refs == list(range(N_VIEWS))


def test_bmvs_finetune_dataset(bmvs_tree):
    root, scene = bmvs_tree
    cfg = DatasetConfig(dataset_name="bmvs_finetune", data_dir=root,
                        split=None, scene=(scene,), ref_view=(0,),
                        num_src_view=2, num_views=3, img_hw=IMG_HW,
                        n_rays=64, val_res_level=8)
    ds = BMVSFinetuneDataset(cfg, rng=np.random.RandomState(0))
    assert ds.num_views == 3
    all_imgs = ds.get_all_images()
    assert all_imgs["imgs"].shape == (3, *IMG_HW, 3)
    b = ds.get_random_rays(2)
    np.testing.assert_array_equal(b["view_ids"], [2, 0, 1])
    assert b["color"].shape == (64, 3)
    v = ds.get_rays_at(0)
    H, W = IMG_HW
    assert v["rays_o"].shape == ((H // 8) * (W // 8), 3)
    assert "masks" in v and v["scale_mat"].shape == (4, 4)


# -- registry ----------------------------------------------------------------


def test_get_dataset_dispatch(dtu_tree, bmvs_tree):
    from gens_tpu.runner import get_dataset

    root, scan = dtu_tree
    ds = get_dataset(dtu_cfg(root, scan), "train", np.random.RandomState(0))
    assert isinstance(ds, DTUDataset)
    broot, scene = bmvs_tree
    cfg = DatasetConfig(dataset_name="bmvs", data_dir=broot, split=None,
                        scene=(scene,), ref_view=(0,), num_src_view=2,
                        img_hw=IMG_HW, n_rays=64)
    assert isinstance(get_dataset(cfg, "val", np.random.RandomState(0)),
                      BMVSDataset)
