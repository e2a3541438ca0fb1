"""Synthetic analytic-SDF scene: Lambertian unit-ish sphere rendered from a
camera ring.

The reference has no test suite; SURVEY.md §4 recommends a tiny synthetic
scene (analytic SDF + ray-traced views) as the end-to-end fixture. This
module produces inputs in exactly the shapes the data pipeline emits
(imgs (V,H,W,3), intrs (V,3,3), c2ws (V,4,4), rays, near/far), entirely in
numpy, so tests and the overfit smoke benchmark need no dataset on disk.
"""

from __future__ import annotations

import numpy as np


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """c2w matrix with camera +z looking at ``target`` (OpenCV convention:
    x right, y down, z forward)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


def sphere_sdf(pts: np.ndarray, radius: float = 0.5) -> np.ndarray:
    return np.linalg.norm(pts, axis=-1) - radius


def render_sphere_view(c2w: np.ndarray, intr: np.ndarray, hw, radius=0.5,
                       light_dir=(0.4, 0.3, -0.85)) -> np.ndarray:
    """Analytic ray-traced shaded sphere image (H, W, 3) in [0, 1]."""
    H, W = hw
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(np.float32)
    dirs = pix @ np.linalg.inv(intr).T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs @ c2w[:3, :3].T
    origin = c2w[:3, 3]

    # ray-sphere intersection
    b = np.sum(dirs * origin, axis=-1)
    c = np.sum(origin ** 2) - radius ** 2
    disc = b ** 2 - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0

    pts = origin + dirs * t[..., None]
    normals = pts / radius
    light = np.asarray(light_dir, np.float32)
    light = light / np.linalg.norm(light)
    shade = np.clip(-np.sum(normals * light, axis=-1), 0.1, 1.0)

    # mildly textured albedo so NCC/blending have signal
    albedo = 0.5 + 0.25 * np.sin(6.0 * pts[..., 0]) * np.cos(6.0 * pts[..., 1])
    img = np.zeros((H, W, 3), np.float32)
    for ch, tint in enumerate((1.0, 0.8, 0.6)):
        img[..., ch] = np.where(hit, shade * albedo * tint, 0.05)
    return img


def make_scene(n_views: int = 3, hw=(64, 64), radius: float = 0.5,
               cam_dist: float = 2.0, n_rays: int = 64, seed: int = 0):
    """Build a full training-style input dict for a synthetic sphere scene."""
    H, W = hw
    rng = np.random.RandomState(seed)

    focal = 1.2 * max(H, W)
    intr = np.array([[focal, 0, W / 2.0],
                     [0, focal, H / 2.0],
                     [0, 0, 1]], np.float32)

    c2ws, imgs = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / max(n_views, 1) * 0.25  # cluster views
        eye = cam_dist * np.array(
            [np.cos(ang), np.sin(ang), 0.35], np.float32)
        c2w = look_at(eye, np.zeros(3, np.float32))
        c2ws.append(c2w)
        imgs.append(render_sphere_view(c2w, intr, hw, radius))
    c2ws = np.stack(c2ws)
    imgs = np.stack(imgs)
    intrs = np.repeat(intr[None], n_views, axis=0)

    # ray batch from the reference view
    px = rng.randint(0, W, size=n_rays).astype(np.float32)
    py = rng.randint(0, H, size=n_rays).astype(np.float32)
    pix = np.stack([px, py, np.ones_like(px)], axis=-1)
    d = pix @ np.linalg.inv(intr).T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = d @ c2ws[0, :3, :3].T
    rays_o = np.broadcast_to(c2ws[0, :3, 3], rays_d.shape).copy()

    color = imgs[0][py.astype(int), px.astype(int)]

    dist = np.linalg.norm(c2ws[0, :3, 3])
    near = np.full((1, 1), 0.95 * (dist - 1.0), np.float32)
    far = np.full((1, 1), 1.05 * (dist + 1.0), np.float32)

    return {
        "imgs": imgs.astype(np.float32),
        "intrs": intrs.astype(np.float32),
        "c2ws": c2ws.astype(np.float32),
        "rays_o": rays_o.astype(np.float32),
        "rays_d": rays_d.astype(np.float32),
        "near": near,
        "far": far,
        "color": color.astype(np.float32),
        "radius": radius,
    }
