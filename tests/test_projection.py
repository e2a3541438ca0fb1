"""Geometry tests: projection round trips, ray-diff degenerate cases and the
plane-induced homography (golden tests recommended by SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from gens_tpu.data.synthetic import look_at
from gens_tpu.ops.projection import (
    compute_ray_diff,
    lookup_feature,
    project_points,
    scale_intrinsics,
    surface_patch_warp,
)


def _simple_cam(eye, target=(0, 0, 0), f=100.0, hw=(64, 64)):
    H, W = hw
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2w = look_at(np.asarray(eye, np.float32), np.asarray(target, np.float32))
    return intr, c2w


def test_project_points_roundtrip(rng):
    intr, c2w = _simple_cam((0, -2.0, 0))
    # points sampled on rays through known pixels at known depth
    px = rng.uniform(5, 59, size=(50, 2)).astype(np.float32)
    depth = rng.uniform(1.0, 3.0, size=(50, 1)).astype(np.float32)
    pix_h = np.concatenate([px, np.ones((50, 1), np.float32)], -1)
    cam_pts = (pix_h @ np.linalg.inv(intr).T) * depth
    world = cam_pts @ c2w[:3, :3].T + c2w[:3, 3]

    xy, mask = project_points(jnp.asarray(world), jnp.asarray(intr),
                              jnp.asarray(c2w), (64, 64))
    np.testing.assert_allclose(np.asarray(xy), px, rtol=1e-4, atol=1e-3)
    assert np.asarray(mask).all()


def test_project_points_behind_camera():
    intr, c2w = _simple_cam((0, -2.0, 0))
    behind = jnp.asarray(np.array([[0.0, -5.0, 0.0]], np.float32))
    _, mask = project_points(behind, jnp.asarray(intr), jnp.asarray(c2w), (64, 64))
    assert not bool(np.asarray(mask)[0])


def test_scale_intrinsics():
    intr = jnp.asarray(np.array([[[100, 0, 32], [0, 100, 32], [0, 0, 1]]], np.float32))
    out = scale_intrinsics(intr, 2)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), 25.0)
    np.testing.assert_allclose(np.asarray(out[0, 2, 2]), 1.0)


def test_ray_diff_identical_cameras():
    _, c2w = _simple_cam((0, -2.0, 0))
    pts = jnp.asarray(np.random.RandomState(0).randn(10, 3).astype(np.float32) * 0.2)
    rd = compute_ray_diff(pts, jnp.asarray(c2w), jnp.asarray(c2w)[None])
    np.testing.assert_allclose(np.asarray(rd[..., 3]), 1.0, atol=1e-5)  # dot = 1


def test_lookup_feature_shapes_and_mask(rng):
    V, H, W = 3, 32, 32
    intr, _ = _simple_cam((0, -2.0, 0), hw=(H, W))
    c2ws = np.stack([
        look_at(np.array([0, -2.0, 0], np.float32), np.zeros(3, np.float32)),
        look_at(np.array([0.4, -2.0, 0], np.float32), np.zeros(3, np.float32)),
        look_at(np.array([-0.4, -2.0, 0], np.float32), np.zeros(3, np.float32)),
    ])
    intrs = np.repeat(intr[None], V, 0)
    imgs = rng.rand(V, H, W, 3).astype(np.float32)
    feats = [rng.rand(V, H // (2 ** i), W // (2 ** i), 4).astype(np.float32)
             for i in range(3)]
    pts = rng.uniform(-0.3, 0.3, size=(40, 3)).astype(np.float32)

    rgb_feat, ray_diff, mask = lookup_feature(
        jnp.asarray(pts), jnp.asarray(imgs), jnp.asarray(intrs),
        jnp.asarray(c2ws), [jnp.asarray(f) for f in feats])
    assert rgb_feat.shape == (40, V - 1, 3 + 12)
    assert ray_diff.shape == (40, V - 1, 4)
    assert mask.shape == (40, V - 1)
    assert np.asarray(mask).mean() > 0.5  # points near origin visible


def test_homography_patch_warp_planar_scene(rng):
    """For points on a plane, the induced homography must map ref pixels of
    OTHER plane points to their true src projections: verify by sampling a
    linear-ramp src image and comparing to the analytic value."""
    H = W = 96
    intr, ref_c2w = _simple_cam((0, -2.0, 0), f=120.0, hw=(H, W))
    src_c2w = look_at(np.array([0.5, -1.9, 0.1], np.float32), np.zeros(3, np.float32))
    intrs = np.stack([intr, intr])
    c2ws = np.stack([ref_c2w, src_c2w])

    # plane through origin with normal pointing back at the ref camera
    n_world = ref_c2w[:3, 3] / np.linalg.norm(ref_c2w[:3, 3])
    # points on the plane: x . n = 0
    tang = np.linalg.svd(n_world[None])[2][1:]  # 2 tangent vectors
    uv = rng.uniform(-0.2, 0.2, size=(12, 2)).astype(np.float32)
    pts = uv @ tang.astype(np.float32)

    # normals in REF CAMERA frame (what the renderer passes)
    n_cam = ref_c2w[:3, :3].T @ n_world

    # src image = linear ramp in pixel coords -> sampled value tells us
    # exactly where the warp landed
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ramp = np.stack([xs, ys], axis=-1).astype(np.float32)  # (H, W, 2)
    images = np.stack([ramp, ramp])

    ref_p, src_p = surface_patch_warp(
        jnp.asarray(pts), jnp.asarray(np.repeat(n_cam[None], 12, 0)),
        jnp.asarray(images), jnp.asarray(intrs), jnp.asarray(c2ws),
        patch_size=1)

    # true src projection of the plane points
    w2c = np.linalg.inv(src_c2w)
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    uvw = cam @ intr.T
    expect = uvw[:, :2] / uvw[:, 2:]

    got = np.asarray(src_p)[0, :, 0, :]  # (N, 2) sampled ramp = pixel coords
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=0.1)

    # ref patch center must sample the ref projection of the point itself
    w2c_r = np.linalg.inv(ref_c2w)
    cam_r = pts @ w2c_r[:3, :3].T + w2c_r[:3, 3]
    uvw_r = cam_r @ intr.T
    expect_r = uvw_r[:, :2] / uvw_r[:, 2:]
    got_r = np.asarray(ref_p)[:, 0, :]
    np.testing.assert_allclose(got_r, expect_r, rtol=1e-3, atol=0.1)


def test_lookup_feature_packed_matches_unpacked(rng):
    """The supercell-packed fast path must be numerically identical to the
    plain bilerp path (same guarantee as ops/interp's 3D tests, here for
    the full multi-scale lookup_feature)."""
    from gens_tpu.ops.interp import pack_supercell2d

    V, H, W = 3, 32, 32
    intr, _ = _simple_cam((0, -2.0, 0), hw=(H, W))
    c2ws = np.stack([
        look_at(np.array([0, -2.0, 0], np.float32), np.zeros(3, np.float32)),
        look_at(np.array([0.4, -2.0, 0], np.float32), np.zeros(3, np.float32)),
        look_at(np.array([-0.4, -2.0, 0], np.float32), np.zeros(3, np.float32)),
    ])
    intrs = np.repeat(intr[None], V, 0)
    imgs = jnp.asarray(rng.rand(V, H, W, 3).astype(np.float32))
    feats = [jnp.asarray(
        rng.rand(V, H // (2 ** i), W // (2 ** i), 4).astype(np.float32))
        for i in range(3)]
    # include points that land out of image so mask parity is exercised
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, size=(64, 3)).astype(np.float32))

    plain = lookup_feature(pts, imgs, jnp.asarray(intrs), jnp.asarray(c2ws),
                           feats)
    packed = lookup_feature(pts, imgs, jnp.asarray(intrs), jnp.asarray(c2ws),
                            feats,
                            packed_features=[pack_supercell2d(f) for f in feats],
                            packed_imgs=pack_supercell2d(imgs))
    for a, b in zip(plain, packed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_surface_patch_warp_packed_matches_unpacked(rng):
    """Packed homography patch warp == plain path (values to 1e-5)."""
    from gens_tpu.ops.interp import pack_supercell2d

    H = W = 48
    intr, ref_c2w = _simple_cam((0, -2.0, 0), f=80.0, hw=(H, W))
    src_c2w = look_at(np.array([0.5, -1.9, 0.1], np.float32),
                      np.zeros(3, np.float32))
    intrs = jnp.asarray(np.stack([intr, intr]))
    c2ws = jnp.asarray(np.stack([ref_c2w, src_c2w]))

    images = jnp.asarray(rng.rand(2, H, W, 6).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.2, 0.2, size=(10, 3)).astype(np.float32))
    n_world = ref_c2w[:3, 3] / np.linalg.norm(ref_c2w[:3, 3])
    n_cam = ref_c2w[:3, :3].T @ n_world
    normals = jnp.asarray(np.repeat(n_cam[None], 10, 0).astype(np.float32))

    ref_a, src_a = surface_patch_warp(pts, normals, images, intrs, c2ws,
                                      patch_size=5)
    ref_b, src_b = surface_patch_warp(pts, normals, None, intrs, c2ws,
                                      patch_size=5,
                                      packed_images=pack_supercell2d(images))
    np.testing.assert_allclose(np.asarray(ref_a), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(src_a), np.asarray(src_b),
                               rtol=1e-5, atol=1e-5)
