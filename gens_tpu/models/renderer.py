"""NeuS-style SDF volume renderer with IBRNet blending and MFC patch warp.

Re-design of /root/reference/models/modules/implicit_surface.py:47-499
(`render_core`, `render`, `extract_geometry`). Differences from the
reference that are deliberate TPU-first design (SURVEY.md §7.1):

* No boolean indexing: every sample point is evaluated densely and
  out-of-volume points are masked with ``jnp.where`` (sdf sentinel 100.0,
  implicit_surface.py:181). Static shapes keep XLA happy; the SDF MLP is
  cheap relative to a dense 128-wide matmul on the MXU anyway.
* Point gradients are nested ``jax.grad`` (no custom double-backward).
* The TV regularizer uses the correct per-axis mask denominators
  (the reference divides ty/tz by mx.sum — implicit_surface.py:146-147 —
  a quirk SURVEY.md §7.5 says not to copy).
* `step < 5` feature-source switching is a static ``use_match_features``
  flag resolved by the caller.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gens_tpu.config import RenderConfig
from gens_tpu.models.sdf_net import SDFNetwork
from gens_tpu.ops.interp import (combine_mask_cascade, lookup_mask,
                                 lookup_mask_cascade, safe_norm)
from gens_tpu.ops.projection import lookup_feature, surface_patch_warp
from gens_tpu.ops.sampling import SDF_SENTINEL, hierarchical_sample


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Scene:
    """Per-scene conditioning inputs for rendering (all device arrays).

    volumes / mask_volumes: cascade lists (X,Y,Z,C) / (X,Y,Z);
    features / match_features: per-scale (V, H_i, W_i, C);
    imgs (V, H, W, 3); intrs (V, 3, 3); c2ws (V, 4, 4).
    """

    volumes: Any
    mask_volumes: Any
    features: Any
    match_features: Any
    imgs: jnp.ndarray
    intrs: jnp.ndarray
    c2ws: jnp.ndarray
    # pre-OR'd finest-resolution mask (combine_mask_cascade); lazily derived
    # from mask_volumes when absent
    mask_any: Any = None
    # supercell-packed cascade (list[PackedVolume]) — packed ONCE per scene
    # when sdf_network.packed_trilerp is on; the SDF lookups use it, the TV
    # regularizer keeps the raw volumes
    packed_volumes: Any = None
    # supercell-packed feature pyramid / RGB images (lists of PackedImage)
    # for the source-view warps, when color_network.packed_bilerp is on
    packed_features: Any = None
    packed_imgs: Any = None
    # supercell-packed MFC warp stacks (PackedImage each); the warp features
    # are stop_gradient'd even in training (implicit_surface.py:313-326), so
    # these are safe on every path
    packed_warp: Any = None
    packed_match_warp: Any = None
    # fused single-gather tables (inference fast path, gather_probe.py:
    # one big gather beats 6 small ones): all cascade scales + the mask
    # volume in one buffer (FusedCascade), and all feature scales + RGB in
    # one per-view buffer (FusedImagePyramid)
    fused_cascade: Any = None
    fused_pyramid: Any = None


def scene_sdf_volumes(scene: "Scene"):
    """The cascade representation the SDF net should sample from
    (gradient-free paths)."""
    if scene.fused_cascade is not None:
        return scene.fused_cascade
    return (scene.packed_volumes if scene.packed_volumes is not None
            else scene.volumes)


def scene_mask_any(scene: "Scene") -> jnp.ndarray:
    if scene.mask_any is not None:
        return scene.mask_any
    return combine_mask_cascade(scene.mask_volumes)


def tv_regularization(volumes, mask_volumes) -> jnp.ndarray:
    """Masked anisotropic total variation over the cascade, weighted 0.5^i
    (implicit_surface.py:135-150, with fixed denominators)."""
    total = 0.0
    for i, (vol, mask) in enumerate(zip(volumes, mask_volumes)):
        m = mask[..., None]
        mx = (m[1:] * m[:-1]) > 0
        my = (m[:, 1:] * m[:, :-1]) > 0
        mz = (m[:, :, 1:] * m[:, :, :-1]) > 0
        # fp32 accumulation: the volumes may be bf16-resident
        tx = jnp.sum((vol[1:] - vol[:-1]) ** 2 * mx,
                     dtype=jnp.float32) / (mx.sum() + 1e-8)
        ty = jnp.sum((vol[:, 1:] - vol[:, :-1]) ** 2 * my,
                     dtype=jnp.float32) / (my.sum() + 1e-8)
        tz = jnp.sum((vol[:, :, 1:] - vol[:, :, :-1]) ** 2 * mz,
                     dtype=jnp.float32) / (mz.sum() + 1e-8)
        total = total + jnp.sqrt(tx + ty + tz + 1e-12) * 0.5 ** i
    return total


def _upsample_to(feat: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear-resize (V, h, w, C) to (V, H, W, C) (F.interpolate equivalent,
    implicit_surface.py:316)."""
    V, _, _, C = feat.shape
    return jax.image.resize(feat, (V, hw[0], hw[1], C), method="bilinear")


def make_warp_feature_stack(features: Sequence[jnp.ndarray],
                            n_scales: int = 3) -> jnp.ndarray:
    """Stack the finest ``n_scales`` feature maps at full resolution for the
    MFC patch warp (implicit_surface.py:313-326). Detached by the caller."""
    hw = features[0].shape[1:3]
    stack = [features[0]] + [_upsample_to(features[i], hw) for i in range(1, n_scales)]
    return jnp.concatenate(stack, axis=-1)


class Renderer:
    """Pure-function renderer bound to module definitions.

    params keys: 'sdf', 'blending', 'variance' (flax param trees).
    """

    def __init__(self, sdf_module, blending_module, variance_module,
                 cfg: RenderConfig, color_head: str = "blending"):
        self.sdf = sdf_module
        self.blending = blending_module
        self.variance = variance_module
        self.cfg = cfg
        # "blending" = IBRNet source-view blending (reference live path);
        # "idr" = surface-light-field MLP over the SDF latent code
        self.color_head = color_head

    # -- SDF helpers -------------------------------------------------------

    def sdf_fn(self, params, volumes) -> Callable[[jnp.ndarray], jnp.ndarray]:
        def f(pts):
            return self.sdf.apply(params["sdf"], pts, volumes,
                                  method=SDFNetwork.sdf)
        return f

    def masked_sdf_fn(self, params, volumes, mask_any):
        raw = self.sdf_fn(params, volumes)

        def f(pts):
            m = lookup_mask(mask_any, pts)
            return jnp.where(m > 0, raw(pts), SDF_SENTINEL)
        return f

    def fused_masked_sdf_fn(self, params, fc):
        """(sdf with out-of-volume sentinel, voxel mask) — mask and cascade
        features ride in ONE fused gather (FusedCascade inference path)."""

        def f(pts):
            sdf, m = self.sdf.apply(params["sdf"], pts, fc,
                                    method=SDFNetwork.sdf_and_mask)
            return jnp.where(m > 0, sdf, SDF_SENTINEL), m

        return f

    def sdf_value_grad_masked(self, params, fc, pts):
        """Fused (full_output, gradients, voxel_mask): the inference render
        core's value+grad pass with the mask probe folded into the same
        gather (one op instead of value-gather + mask-gather)."""

        def full_fn(p):
            return self.sdf.apply(params["sdf"], p, fc, True)

        out, vjp, mask = jax.vjp(full_fn, pts, has_aux=True)
        ct = jnp.zeros_like(out).at[:, 0].set(1.0)
        (gradients,) = vjp(ct)
        return out, gradients, mask

    def sdf_gradients(self, params, volumes, pts):
        """(gradients, smooth) at pts (sdf_network.py:131-153).

        Forward-over-reverse: one jvp through the gradient returns the
        gradient (primal) and Hessian·1 (tangent) fused; by Hessian symmetry
        the tangent equals the reference's ``grad(grad(sdf) @ ones)``."""
        raw = self.sdf_fn(params, volumes)

        def sdf_sum(p):
            return raw(p).sum()

        return jax.jvp(jax.grad(sdf_sum), (pts,), (jnp.ones_like(pts),))

    def sdf_gradient(self, params, volumes, pts):
        """First-order ∇SDF only (for the surface-root normal, where the
        reference also discards the second-order term)."""
        raw = self.sdf_fn(params, volumes)
        return jax.grad(lambda p: raw(p).sum())(pts)

    def sdf_value_grad_smooth(self, params, volumes, pts):
        """Fused (full_output (N,C), gradients (N,3), smooth (N,3)).

        One vjp gives the full MLP output and ∇SDF; one jvp through that
        gives Hessian·1 — the render core's three derivative quantities in a
        single pass instead of three."""

        def full_fn(p):
            return self.sdf.apply(params["sdf"], p, volumes)

        def grad_fn(p):
            out, vjp = jax.vjp(full_fn, p)
            ct = jnp.zeros_like(out).at[:, 0].set(1.0)
            (g,) = vjp(ct)
            return g, out

        (gradients, sdf_out), (smooth, _) = jax.jvp(
            grad_fn, (pts,), (jnp.ones_like(pts),))
        return sdf_out, gradients, smooth

    def sdf_value_grad(self, params, volumes, pts):
        """Fused (full_output, gradients) via one vjp — the inference path.

        The ``smooth`` Hessian·1 term only feeds the training loss
        (loss.py:32 in the reference); skipping the jvp-of-vjp at inference
        halves the derivative cost (27.2 -> ~14 ms/1024 rays measured)."""

        def full_fn(p):
            return self.sdf.apply(params["sdf"], p, volumes)

        out, vjp = jax.vjp(full_fn, pts)
        ct = jnp.zeros_like(out).at[:, 0].set(1.0)
        (gradients,) = vjp(ct)
        return out, gradients

    # -- core --------------------------------------------------------------

    def render_core(self, params, rays_o, rays_d, z_vals, sample_dist,
                    scene: Scene, cos_anneal_ratio: float,
                    use_match_features: bool, key, train: bool = True):
        cfg = self.cfg
        R, S = z_vals.shape
        volumes, mask_volumes = scene.volumes, scene.mask_volumes
        # Packed supercell tables are built by a patch-extraction conv whose
        # BACKWARD provokes a pathological XLA layout (compile-time OOM).
        # Training therefore routes grad-carrying SDF evals through the
        # packed-DIFF chain (ops/interp.py): forward reads the packed tables,
        # gradients scatter into the raw volumes, the pack conv appears in
        # no backward. Inference uses the plain packed lookup.
        sdf_vols_nograd = scene_sdf_volumes(scene)
        if not train:
            sdf_vols = sdf_vols_nograd
        elif scene.packed_volumes is not None:
            from gens_tpu.ops.interp import DiffPackedCascade

            sdf_vols = DiffPackedCascade(list(volumes),
                                         list(scene.packed_volumes))
        else:
            sdf_vols = volumes
        mask_any = scene_mask_any(scene)

        dists = z_vals[:, 1:] - z_vals[:, :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[:, :1], sample_dist)], axis=-1)
        mid_z = z_vals + dists * 0.5

        pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]  # (R,S,3)
        dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
        pts_flat = pts.reshape(-1, 3)
        dirs_flat = dirs.reshape(-1, 3)

        fused = (not train and scene.fused_cascade is not None
                 and scene.fused_cascade.mask_offset is not None
                 and not self.sdf.cfg.fused_sampling_only)
        if train:
            voxel_mask = lookup_mask(mask_any, pts_flat)  # (R*S,)
            sdf_out, gradients, smooth = self.sdf_value_grad_smooth(
                params, sdf_vols, pts_flat)
            smooth = smooth * voxel_mask[:, None]
        elif fused:
            # mask probe rides in the same gather as the cascade features
            sdf_out, gradients, voxel_mask = self.sdf_value_grad_masked(
                params, scene.fused_cascade, pts_flat)
            smooth = jnp.zeros_like(gradients)
        else:
            voxel_mask = lookup_mask(mask_any, pts_flat)  # (R*S,)
            sdf_out, gradients = self.sdf_value_grad(
                params, sdf_vols, pts_flat)
            smooth = jnp.zeros_like(gradients)
        sdf = jnp.where(voxel_mask > 0, sdf_out[:, 0], SDF_SENTINEL)  # (R*S,)
        gradients = gradients * voxel_mask[:, None]

        if self.color_head == "idr":
            # surface-light-field head: RGB from (point, normal, view dir,
            # SDF latent) — the reference's RenderingNetwork wired live
            sampled_color = self.blending.apply(
                params["blending"], pts_flat, gradients, dirs_flat,
                sdf_out[:, 1:])
            sampled_color = sampled_color * voxel_mask[:, None]
            sampled_color = sampled_color.reshape(R, S, 3)
            valid_mask = jnp.ones((R, 1), bool)
        else:
            # -- source-view color blending (implicit_surface.py:194-204)
            if not train and scene.fused_pyramid is not None:
                from gens_tpu.ops.projection import lookup_feature_fused

                rgb_feat, ray_diff, view_mask = lookup_feature_fused(
                    pts_flat, scene.fused_pyramid, scene.intrs, scene.c2ws)
            else:
                rgb_feat, ray_diff, view_mask = lookup_feature(
                    pts_flat, scene.imgs, scene.intrs, scene.c2ws,
                    scene.features, packed_features=scene.packed_features,
                    packed_imgs=scene.packed_imgs, diff=train)
            sampled_color = self.blending.apply(
                params["blending"], rgb_feat, ray_diff, view_mask)
            sampled_color = sampled_color * voxel_mask[:, None]
            sampled_color = sampled_color.reshape(R, S, 3)
            view_mask = view_mask & (voxel_mask[:, None] > 0)

            # ray validity: >8 samples seen by >1 source view
            # (implicit_surface.py:202-204; the threshold semantics are
            # "strictly more than minimum_vas_view=1 views")
            vm = jax.lax.stop_gradient(
                view_mask.reshape(R, S, -1).astype(jnp.float32))
            valid_mask = (vm.sum(axis=2) > 1).astype(jnp.float32).sum(
                axis=1, keepdims=True) > 8  # (R, 1) bool

        inv_s = jnp.clip(self.variance.apply(params["variance"]), 1e-6, 1e6)

        true_cos = jnp.sum(dirs_flat * gradients, axis=-1, keepdims=True)
        iter_cos = -(
            jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
            + jax.nn.relu(-true_cos) * cos_anneal_ratio
        )
        iter_cos = iter_cos * voxel_mask[:, None]

        dists_flat = dists.reshape(-1, 1)
        est_next = sdf[:, None] + jnp.clip(iter_cos, -10.0, 10.0) * dists_flat * 0.5
        est_prev = sdf[:, None] - jnp.clip(iter_cos, -10.0, 10.0) * dists_flat * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        alpha = jnp.clip(
            ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)).reshape(R, S),
            0.0, 1.0,
        )
        alpha = alpha * voxel_mask.reshape(R, S)

        pts_norm = jnp.linalg.norm(pts_flat, axis=-1).reshape(R, S)
        vmask_rs = voxel_mask.reshape(R, S)
        inside_sphere = jax.lax.stop_gradient(
            (pts_norm < 1.0).astype(jnp.float32)) * vmask_rs
        relax_inside = jax.lax.stop_gradient(
            (pts_norm < 1.2).astype(jnp.float32)) * vmask_rs

        trans = jnp.cumprod(
            jnp.concatenate(
                [jnp.ones((R, 1), alpha.dtype), 1.0 - alpha + 1e-7], axis=-1),
            axis=-1,
        )[:, :-1]
        weights = alpha * trans
        weights_sum = weights.sum(axis=-1, keepdims=True)

        color = jnp.sum(sampled_color * weights[..., None], axis=1)  # (R,3)

        rot = jnp.linalg.inv(scene.c2ws[0, :3, :3])
        normal = jnp.sum(
            gradients.reshape(R, S, 3) * weights[..., None], axis=1) @ rot.T

        cam_rays_d = rays_d @ rot.T  # (R,3) ray dirs in ref cam frame
        render_depth = jnp.sum(mid_z * weights, axis=1) * cam_rays_d[:, 2]

        # Eikonal residuals in the relaxed sphere; reduction happens in the
        # loss so sharded ray batches psum exact (num, denom) pairs
        # (implicit_surface.py:249-250)
        grad_norm = safe_norm(gradients.reshape(R, S, 3), axis=-1)
        grad_sq_err = (grad_norm - 1.0) ** 2

        # 2nd-order smoothness at the surface (implicit_surface.py:252-253).
        # TRAIN-ONLY: with train=False the Hessian jvp is skipped and
        # ``smooth`` (hence this key) is identically zero — a placeholder so
        # the return pytree keeps one structure, NOT a measurement. Don't
        # read it at inference.
        smooth_sur = jnp.sum(
            smooth.reshape(R, S, 3)
            * jax.lax.stop_gradient(weights)[..., None]
            * inside_sphere[..., None],
            axis=1,
        )

        # sparse random-point SDF (implicit_surface.py:256-257)
        if key is not None:
            pts_random = jax.random.uniform(
                key, (cfg.n_sparse_pts, 3), minval=-1.0, maxval=1.0)
            sdf_random = self.sdf.apply(
                params["sdf"], pts_random, sdf_vols, method=SDFNetwork.sdf)
            sparse_sdf = jnp.concatenate([sdf_random, sdf])
        else:
            sparse_sdf = sdf

        tv_reg = tv_regularization(volumes, mask_volumes)

        # -- zero-crossing surface localization (implicit_surface.py:262-311)
        sdf_d = sdf.reshape(R, S)
        prev_sdf, next_sdf = sdf_d[:, :-1], sdf_d[:, 1:]
        seg_valid = ((vmask_rs[:, :-1] * vmask_rs[:, 1:]) > 0).astype(jnp.float32)
        sign = jnp.where(prev_sdf * next_sdf <= 0, 1.0, 0.0)
        idx_w = jnp.arange(S - 1, 0, -1, dtype=jnp.float32)[None, :]
        tmp = sign * idx_w * seg_valid
        prev_idx = jnp.argmax(tmp, axis=1)  # (R,) first sign change
        next_idx = prev_idx + 1

        def gather(a, idx):
            return jnp.take_along_axis(a, idx[:, None], axis=1)  # (R,1)

        prev_in = gather(inside_sphere, prev_idx)
        next_in = gather(inside_sphere, next_idx)
        mid_inside = (0.5 * (prev_in + next_in) > 0.5).astype(jnp.float32)
        mid_inside = mid_inside * (
            tmp.sum(axis=1, keepdims=True) > 0).astype(jnp.float32)

        grad_d = jax.lax.stop_gradient(gradients.reshape(R, S, 3))
        g1 = jnp.take_along_axis(grad_d, prev_idx[:, None, None].repeat(3, -1), axis=1)[:, 0]
        g2 = jnp.take_along_axis(grad_d, next_idx[:, None, None].repeat(3, -1), axis=1)[:, 0]
        cos_d = jnp.sum(g1 * g2, axis=-1) / (
            jnp.linalg.norm(g1, axis=-1) * jnp.linalg.norm(g2, axis=-1) + 1e-8)
        mid_inside = mid_inside * (cos_d[:, None] > 0.5).astype(jnp.float32)

        sdf1 = gather(sdf_d, prev_idx)
        sdf2 = gather(sdf_d, next_idx)
        z1 = gather(mid_z, prev_idx)
        z2 = gather(mid_z, next_idx)
        # corrected Eq.7 linear-interp root (README.md:13-15,
        # implicit_surface.py:292)
        z_sdf0 = (sdf1 * z2 - sdf2 * z1) / (sdf1 - sdf2 + 1e-10)

        sdf_depth = z_sdf0 * cam_rays_d[:, 2:3] * mid_inside  # (R,1)

        z_sdf0 = jnp.where(z_sdf0 < 0, 0.0, z_sdf0)
        z_sdf0 = jnp.where(z_sdf0 > jnp.max(z_vals), 0.0, z_sdf0)
        pts_sdf0 = rays_o + rays_d * z_sdf0  # (R,3)

        # normal_sdf0 is stop_gradient'd below, so the packed tables are
        # safe here even in training
        grad_sdf0 = self.sdf_gradient(params, sdf_vols_nograd, pts_sdf0)
        g0n = safe_norm(grad_sdf0, axis=-1, keepdims=True, eps=1e-16)
        normal_sdf0 = grad_sdf0 / g0n
        # rotate into ref camera frame and detach (implicit_surface.py:311)
        normal_sdf0 = jax.lax.stop_gradient(normal_sdf0 @ rot.T)

        packed_w = (scene.packed_match_warp if use_match_features
                    else scene.packed_warp)
        if packed_w is not None:
            ref_gray, sampled_gray = surface_patch_warp(
                pts_sdf0, normal_sdf0, None, scene.intrs, scene.c2ws,
                patch_size=cfg.patch_size, packed_images=packed_w)
        else:
            feats_src = (scene.match_features if use_match_features
                         else scene.features)
            warp_feats = jax.lax.stop_gradient(
                make_warp_feature_stack(feats_src, cfg.warp_scales))
            ref_gray, sampled_gray = surface_patch_warp(
                pts_sdf0, normal_sdf0, warp_feats, scene.intrs, scene.c2ws,
                patch_size=cfg.patch_size)

        return {
            "color_fine": color,
            "render_depth": render_depth,
            "sdf_depth": sdf_depth,
            "normal": normal,
            "gradients": gradients.reshape(R, S, 3),
            "weights": weights,
            "weight_sum": weights_sum,
            "weight_max": jnp.max(weights, axis=-1, keepdims=True),
            "s_val": 1.0 / inv_s,
            "valid_mask": valid_mask,
            "mid_inside_sphere": mid_inside,
            "inside_sphere": inside_sphere,
            "grad_sq_err": grad_sq_err,
            "relax_inside_sphere": relax_inside,
            # TRAIN-ONLY: with train=False the Hessian·1 pass is skipped and
            # this is zeros, not a measurement — only the training loss may
            # consume it (ADVICE r1)
            "smooth_sur": smooth_sur,
            "sparse_sdf": sparse_sdf,
            "tv_reg": tv_reg,
            "ref_gray_val": ref_gray,
            "sampled_gray_val": sampled_gray,
        }

    # -- full render -------------------------------------------------------

    def render(self, params, rays_o, rays_d, near, far, scene: Scene,
               cos_anneal_ratio: float = 1.0, use_match_features: bool = False,
               key=None, train: bool = True):
        cfg = self.cfg
        sample_dist = 2.0 / cfg.n_samples

        perturb_key = sparse_key = None
        if key is not None:
            perturb_key, sparse_key = jax.random.split(key)
        if cfg.perturb <= 0:
            perturb_key = None

        # NB: the fused Pallas cascade+MLP kernel was measured SLOWER here
        # (6.6k vs 8.3k rays/s — the packed single-gather loses to XLA's
        # per-scale gathers at render point counts); it stays on the dense
        # grid-extraction path only
        vols = scene_sdf_volumes(scene)
        masked_sdf = None
        if (scene.fused_cascade is not None
                and scene.fused_cascade.mask_offset is not None):
            # sampling is no-grad on every path, so the fused single-gather
            # (sdf + mask in one op) is safe in training too
            fused_fn = self.fused_masked_sdf_fn(params, scene.fused_cascade)

            def masked_sdf(p):
                s, m = fused_fn(p)
                return jax.lax.stop_gradient(s), jax.lax.stop_gradient(m)

        sdf_fn = self.sdf_fn(params, vols)
        z_vals = hierarchical_sample(
            rays_o, rays_d, near, far,
            lambda p: jax.lax.stop_gradient(sdf_fn(p)),
            jax.lax.stop_gradient(scene_mask_any(scene)),
            cfg.n_samples, cfg.n_importance, cfg.up_sample_steps,
            perturb_key=perturb_key, masked_sdf=masked_sdf,
        )

        return self.render_core(
            params, rays_o, rays_d, z_vals, sample_dist, scene,
            cos_anneal_ratio, use_match_features, sparse_key, train=train)

    def pseudo_sdf(self, params, scene: Scene, pseudo_pts: jnp.ndarray):
        """SDF at back-projected pseudo points, zero outside the voxel mask
        (implicit_surface.py:489-497)."""
        m = lookup_mask(scene_mask_any(scene), pseudo_pts)
        # training path (pseudo-SDF loss backprops into the volumes): the
        # packed-diff cascade when tables exist, else the raw cascade
        if scene.packed_volumes is not None:
            from gens_tpu.ops.interp import DiffPackedCascade

            vols = DiffPackedCascade(list(scene.volumes),
                                     list(scene.packed_volumes))
        else:
            vols = scene.volumes
        sdf = self.sdf.apply(params["sdf"], pseudo_pts, vols,
                             method=SDFNetwork.sdf)
        return jnp.where(m > 0, sdf, 0.0)[:, None]

    def sdf_grid_block(self, params, volumes, pts_block: jnp.ndarray):
        """Negated SDF on a block of grid points for marching cubes
        (implicit_surface.py:407-427 evaluates -sdf)."""
        return -self.sdf.apply(params["sdf"], pts_block, volumes,
                               method=SDFNetwork.sdf)

    def sdf_fn_for_extraction(self, params, volumes):
        """Gradient-free SDF function for dense grid evaluation: the fused
        Pallas MLP kernel on TPU (ops/pallas_mlp.py), the jnp path
        elsewhere."""
        if jax.default_backend() != "cpu":
            try:
                from gens_tpu.ops.pallas_mlp import sdf_fused_fn

                return sdf_fused_fn(params["sdf"], self.sdf.cfg, volumes)
            except Exception:
                pass
        return self.sdf_fn(params, volumes)
