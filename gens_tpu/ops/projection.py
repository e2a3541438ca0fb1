"""Camera projection, cross-view feature lookup and homography patch warp.

TPU-native re-design of /root/reference/models/modules/projector.py
(compute_angle :278-291, lookup_feature :294-349, surface_patch_warp
:353-419, patch_homography :422-437). Everything is dense, static-shape
and channels-last; per-view work is expressed with vmap so a view-sharded
shard_map can map it over the mesh.

Conventions:
  * intrinsics ``K (V, 3, 3)`` at the finest feature scale; scale ``i``
    divides the first two rows by ``2**i`` (reference projector.py:317-318).
  * ``c2w (V, 4, 4)`` camera-to-world. View 0 is the reference view,
    views 1..V-1 the source views.
  * feature maps ``(V, H_i, W_i, C)`` per scale, fine-to-coarse.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from gens_tpu.ops.interp import bilerp, safe_norm


def scale_intrinsics(intrs: jnp.ndarray, scale_idx: int) -> jnp.ndarray:
    """Adjust intrinsics for feature scale ``i`` (rows 0-1 *= 0.5**i)."""
    factor = 0.5 ** scale_idx
    return intrs.at[..., :2, :].multiply(factor)


def project_points(pts: jnp.ndarray, intr: jnp.ndarray, c2w: jnp.ndarray,
                   hw: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points into one camera.

    pts: (N, 3); intr: (3, 3); c2w: (4, 4); hw: image size at this scale.
    Returns pixel xy ``(N, 2)`` and in-frustum mask ``(N,)``
    (z > 0 and inside the image, reference projector.py:329).

    Camera-geometry matmuls run at HIGHEST precision: their FLOPs are
    negligible but TPU bf16 MXU passes visibly shift projected pixels.
    """
    h, w = hw
    with jax.default_matmul_precision("highest"):
        w2c = jnp.linalg.inv(c2w)
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        uvw = cam @ intr.T
    z = uvw[..., 2:3]
    xy = uvw[..., :2] / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    mask = (
        (z[..., 0] > 0)
        & (xy[..., 0] >= 0) & (xy[..., 0] < w)
        & (xy[..., 1] >= 0) & (xy[..., 1] < h)
    )
    return xy, mask


def compute_ray_diff(pts: jnp.ndarray, ref_c2w: jnp.ndarray,
                     src_c2ws: jnp.ndarray) -> jnp.ndarray:
    """IBRNet ray-difference embedding (reference projector.py:278-291).

    Returns ``(N, S, 4)``: unit direction difference (3) + dot product (1)
    between the ref-camera->point and src-camera->point unit rays.
    """
    to_ref = ref_c2w[:3, 3][None, :] - pts  # (N, 3)
    to_ref = to_ref / (safe_norm(to_ref, axis=-1, keepdims=True) + 1e-6)
    to_src = src_c2ws[:, None, :3, 3] - pts[None, :, :]  # (S, N, 3)
    to_src = to_src / (safe_norm(to_src, axis=-1, keepdims=True) + 1e-6)
    diff = to_ref[None] - to_src  # (S, N, 3)
    norm = safe_norm(diff, axis=-1, keepdims=True)
    dot = jnp.sum(to_ref[None] * to_src, axis=-1, keepdims=True)
    direction = diff / jnp.clip(norm, 1e-6)
    ray_diff = jnp.concatenate([direction, dot], axis=-1)  # (S, N, 4)
    return jnp.transpose(ray_diff, (1, 0, 2))  # (N, S, 4)


def lookup_feature(pts: jnp.ndarray, imgs: jnp.ndarray, intrs: jnp.ndarray,
                   c2ws: jnp.ndarray, features: Sequence[jnp.ndarray],
                   packed_features=None, packed_imgs=None,
                   diff: bool = False):
    """Warp source-view multi-scale features + RGB onto sample points.

    Equivalent of reference projector.py:294-349: project ``pts`` into every
    source view at every scale, bilinear-sample, AND the per-scale in-image
    masks, and sample RGB from the finest scale.

    pts: (N, 3); imgs: (V, H, W, 3); intrs: (V, 3, 3); c2ws: (V, 4, 4);
    features: list of (V, H_i, W_i, C_i) fine-to-coarse.

    When ``packed_features`` / ``packed_imgs`` (lists of
    :class:`~gens_tpu.ops.interp.PackedImage` built once per scene) are
    given, the bilinear sampling goes through one wide supercell gather per
    (view, scale) instead of 4 narrow corner gathers — numerically
    identical, much friendlier to the TPU's addressing-bound gathers.

    ``diff=True`` (training): the packed sampling goes through
    :func:`~gens_tpu.ops.interp.bilerp_packed_diff`, so the forward still
    reads the wide tables but feature/image gradients scatter into the raw
    maps (the pack conv appears in no backward).

    Returns ``rgb_feat (N, S, 3 + sum C_i)``, ``ray_diff (N, S, 4)``,
    ``mask (N, S)`` with S = V - 1 source views.
    """
    from gens_tpu.ops.interp import bilerp_packed_diff, bilerp_supercell

    src_intrs = intrs[1:]
    src_c2ws = c2ws[1:]
    ray_diff = compute_ray_diff(pts, c2ws[0], src_c2ws)

    warped = []
    masks = []
    warped_rgb = None
    for i, feat in enumerate(features):
        hw = feat.shape[1], feat.shape[2]
        intrs_i = scale_intrinsics(src_intrs, i)
        pk = packed_features[i] if packed_features is not None else None

        def sample_one(feat_v, intr_v, c2w_v, table_v=None, _pk=pk):
            xy, mask = project_points(pts, intr_v, c2w_v, hw)
            if table_v is not None and diff:
                vals = bilerp_packed_diff(feat_v, table_v, _pk.dims, xy)
            elif table_v is not None:
                vals = bilerp_supercell(table_v, _pk.dims, xy)
            else:
                vals = bilerp(feat_v, xy)
            return vals, mask

        if pk is not None:
            vals, mask = jax.vmap(sample_one)(
                feat[1:], intrs_i, src_c2ws, pk.table[1:])
        else:
            vals, mask = jax.vmap(sample_one)(feat[1:], intrs_i, src_c2ws)
        warped.append(jnp.transpose(vals, (1, 0, 2)))  # (N, S, C)
        masks.append(jnp.transpose(mask, (1, 0)))  # (N, S)

        if i == 0:
            def sample_rgb(img_v, intr_v, c2w_v, table_v=None):
                xy, _ = project_points(pts, intr_v, c2w_v, hw)
                if table_v is not None and diff:
                    return bilerp_packed_diff(img_v, table_v,
                                              packed_imgs.dims, xy)
                if table_v is not None:
                    return bilerp_supercell(table_v, packed_imgs.dims, xy)
                return bilerp(img_v, xy)

            if packed_imgs is not None:
                rgb = jax.vmap(sample_rgb)(
                    imgs[1:], intrs_i, src_c2ws, packed_imgs.table[1:])
            else:
                rgb = jax.vmap(sample_rgb)(imgs[1:], intrs_i, src_c2ws)
            warped_rgb = jnp.transpose(rgb, (1, 0, 2))  # (N, S, 3)

    rgb_feat = jnp.concatenate([warped_rgb] + warped, axis=-1)
    mask = jnp.stack(masks, axis=-1).all(axis=-1)
    return rgb_feat, ray_diff, mask


def lookup_feature_fused(pts: jnp.ndarray, fp, intrs: jnp.ndarray,
                         c2ws: jnp.ndarray):
    """Inference fast path for :func:`lookup_feature`: ALL scales' feature
    warps + the RGB warp go through ONE gather per view batch (a
    :class:`~gens_tpu.ops.interp.FusedImagePyramid` packed once per scene)
    instead of one gather per (scale) + one for RGB — TPU gathers ramp up
    with population size (scripts/gather_probe.py), so 6 small ops lose to 1
    big one. Numerically identical to the packed per-scale path.

    Returns ``rgb_feat (N, S, 3 + n_scales*C)``, ``ray_diff (N, S, 4)``,
    ``mask (N, S)`` — same contract as :func:`lookup_feature`.
    """
    from gens_tpu.ops.interp import _sc_prepare2, bilerp_fused_rows

    src_intrs = intrs[1:]
    src_c2ws = c2ws[1:]
    ray_diff = compute_ray_diff(pts, c2ws[0], src_c2ws)
    has_rgb = fp.rgb_scale >= 0
    n_scales = len(fp.dims) - (1 if has_rgb else 0)
    N = pts.shape[0]

    def per_view(table_v, intr_v, c2w_v):
        idxs, xys, masks = [], [], []
        for i in range(n_scales):
            hw = fp.dims[i]
            xy, m = project_points(pts, scale_intrinsics(intr_v, i), c2w_v, hw)
            idx, _, _, _ = _sc_prepare2(hw, xy)
            idxs.append(fp.offsets[i] + idx)
            xys.append(xy)
            masks.append(m)
        if has_rgb:
            base = idxs[fp.rgb_scale] - fp.offsets[fp.rgb_scale]
            idxs.append(fp.offsets[n_scales] + base)
        idx = jnp.stack(idxs, axis=0).reshape(-1)
        rows = jnp.take(table_v, idx, axis=0).reshape(
            len(idxs), N, table_v.shape[-1])  # ONE gather per view batch
        feats = [bilerp_fused_rows(rows[i], fp.dims[i], xys[i],
                                   fp.channels[i]) for i in range(n_scales)]
        rgb = (bilerp_fused_rows(rows[n_scales], fp.dims[fp.rgb_scale],
                                 xys[fp.rgb_scale], fp.channels[n_scales])
               if has_rgb else None)
        parts = ([rgb] if rgb is not None else []) + feats
        return jnp.concatenate(parts, axis=-1), jnp.stack(masks, 0).all(0)

    vals, mask = jax.vmap(per_view)(fp.table[1:], src_intrs, src_c2ws)
    return jnp.transpose(vals, (1, 0, 2)), ray_diff, jnp.transpose(mask)


def _homogeneous(xy: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def surface_patch_warp(pts: jnp.ndarray, normals: jnp.ndarray,
                       images, intrs: jnp.ndarray,
                       c2ws: jnp.ndarray, patch_size: int = 11,
                       packed_images=None):
    """Plane-induced homography patch warp for the MFC loss.

    Re-design of reference projector.py:353-419. For each surface point with
    (camera-frame) normal, build the homography H_s = K_s (R_rel + t n^T / d)
    K_ref^-1 from the ref view to each source view induced by the tangent
    plane, then sample a ``patch_size``² pixel patch around the point's ref
    projection in every source view and in the ref view itself.

    pts: (N, 3) world-space surface points.
    normals: (N, 3) unit surface normals already rotated into the REF CAMERA
        frame (reference implicit_surface.py:311 does this rotation).
    images: (V, H, W, C) stacked multi-scale feature images at full res.
    intrs: (V, 3, 3); c2ws: (V, 4, 4).

    When ``packed_images`` (a :class:`~gens_tpu.ops.interp.PackedImage`
    over the stacked views) is given, the patch sampling goes through one
    wide supercell gather per pixel instead of 4 narrow corner gathers
    (numerically identical); ``images`` may then be None.

    Returns ``ref_patches (N, P², C)`` and ``src_patches (S, N, P², C)``.
    """
    N = pts.shape[0]
    S = intrs.shape[0] - 1
    if packed_images is not None:
        H, W = packed_images.dims
    else:
        H, W = images.shape[1], images.shape[2]

    K_ref = intrs[0]
    K_ref_inv = jnp.linalg.inv(K_ref)
    K_src = intrs[1:]
    R_ref = c2ws[0, :3, :3]          # ref cam -> world rotation
    C_ref = c2ws[0, :3, 3]
    R_src_w2c = jnp.transpose(c2ws[1:, :3, :3], (0, 2, 1))  # world -> src cam
    C_src = c2ws[1:, :3, 3]

    with jax.default_matmul_precision("highest"):
        # point in ref camera frame (reference projector.py:366-369)
        pts_ref = (pts - C_ref) @ R_ref  # (N, 3): R_ref^T (p - C_ref)
        proj = pts_ref @ K_ref.T  # (N, 3)

        # plane offset d = n . p_ref (projector.py:371)
        disp = jnp.sum(normals * pts_ref, axis=-1)  # (N,)

        # relative rotation/translation ref->src (projector.py:381-383)
        R_rel = R_src_w2c @ R_ref  # (S, 3, 3)
        t_rel = jnp.einsum("sij,sj->si", R_src_w2c, C_ref[None] - C_src)

        # H = K_src (R_rel + t n^T / d) K_ref^-1, per point per src
        tnT = t_rel[None, :, :, None] * normals[:, None, None, :]  # (N,S,3,3)
        M = R_rel[None] + tnT / (disp[:, None, None, None] + 1e-10)
        Hom = jnp.einsum("sij,nsjk,kl->nsil", K_src, M, K_ref_inv)

    # patch pixel grid around the ref projection (projector.py:389-396)
    px = proj[:, 0] / (proj[:, 2] + 1e-8)
    py = proj[:, 1] / (proj[:, 2] + 1e-8)
    half = patch_size // 2
    offs = jnp.arange(-half, half + 1, dtype=pts.dtype)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    offsets = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # (P², 2)
    pix = jnp.stack([px, py], axis=-1)[:, None, :] + offsets[None]  # (N, P², 2)

    # warp the patch grid through each homography
    pix_h = _homogeneous(pix)  # (N, P², 3)
    with jax.default_matmul_precision("highest"):
        warped = jnp.einsum("nsij,npj->nspi", Hom, pix_h)
    grid = warped[..., :2] / (warped[..., 2:] + 1e-8)  # (N, S, P², 2)

    grid_t = jnp.transpose(grid, (1, 0, 2, 3))  # (S, N, P², 2)
    if packed_images is not None:
        from gens_tpu.ops.interp import bilerp_supercell

        def sample_src(table_s, grid_s):
            return bilerp_supercell(
                table_s, packed_images.dims,
                grid_s.reshape(-1, 2)).reshape(N, patch_size ** 2, -1)

        src_patches = jax.vmap(sample_src)(packed_images.table[1:], grid_t)
        ref_patches = bilerp_supercell(
            packed_images.table[0], packed_images.dims,
            jax.lax.stop_gradient(pix).reshape(-1, 2))
    else:
        def sample_src(img_s, grid_s):
            return bilerp(img_s, grid_s.reshape(-1, 2)).reshape(
                N, patch_size ** 2, -1)

        src_patches = jax.vmap(sample_src)(images[1:], grid_t)
        ref_patches = bilerp(images[0],
                             jax.lax.stop_gradient(pix).reshape(-1, 2))
    ref_patches = ref_patches.reshape(N, patch_size ** 2, -1)
    return ref_patches, src_patches


# -- background-sphere (equirectangular) volume support ----------------------
# Re-design of /root/reference/models/modules/projector.py:248-275
# (equirect2sphere / lookup_sphe_volume — NeRF++-style inverted-sphere
# background parameterization; unused by the reference's live path but kept
# as a working option for unbounded scenes).


def equirect2sphere(pts: jnp.ndarray) -> jnp.ndarray:
    """Map world points OUTSIDE the unit sphere to (theta, phi, 1/r).

    pts (N, 3) -> (N, 3): theta = asin(z/r) in [-pi/2, pi/2], phi =
    atan2(y, x) in [-pi, pi], and inverse distance 1/r in (0, 1] (the radius
    is clipped to >= 1 as in projector.py:253)."""
    r = jnp.clip(safe_norm(pts, axis=1, keepdims=True), 1.0, 1e10)
    x, y, z = pts[:, :1] / r, pts[:, 1:2] / r, pts[:, 2:3] / r
    theta = jnp.arcsin(jnp.clip(z, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    return jnp.concatenate([theta, phi, 1.0 / r], axis=1)


def lookup_sphe_volume(sphe_pts: jnp.ndarray, volume: jnp.ndarray) -> jnp.ndarray:
    """Trilinear lookup of an equirectangular background volume at spherical
    coordinates (projector.py:266-275).

    sphe_pts (N, 3) from :func:`equirect2sphere`; volume (D, H, W, C) indexed
    by normalized (theta, phi, inv_r). Returns (N, C)."""
    from gens_tpu.ops.interp import trilerp

    theta, phi, inv_r = sphe_pts[:, :1], sphe_pts[:, 1:2], sphe_pts[:, 2:3]
    theta = theta / (jnp.pi / 2.0)
    phi = phi / jnp.pi
    inv_r = ((inv_r - 1e-10) / (1.0 - 1e-10) - 0.5) * 2.0
    norm_pts = jnp.concatenate([theta, phi, inv_r], axis=1)
    return trilerp(volume, norm_pts)
