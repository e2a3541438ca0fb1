"""GenS model facade: owns the module definitions and exposes pure functions
over parameter pytrees for the three regimes.

Re-design of /root/reference/models/gens.py:12-157. The torch version keys
its two regimes on a mutable ``has_vol`` flag; here they are simply
different pure functions:

* generalizable (train/val): ``build_scene`` runs feature net -> volume
  aggregation -> 3D U-Net and returns a ``Scene``;
* finetune: the volumes are leaves of the optimized pytree and the frozen
  features/masks live in a static ``Scene`` (gens.py:26-28,147-153).

The frozen matching feature network (gens.py:22-24,133-141) is a separate
param subtree ``match_feature`` that the training loop re-syncs from
``feature`` every ``match_sync_every`` epochs on the host.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from gens_tpu.config import ModelConfig
from gens_tpu.models.blending_net import BlendingNetwork, SingleVarianceNetwork
from gens_tpu.models.feature_net import FeatureNetwork
from gens_tpu.models.reg_net import RegNetwork
from gens_tpu.models.renderer import Renderer, Scene
from gens_tpu.models.sdf_net import SDFNetwork
from gens_tpu.models.volume import AdaptiveAgg, agg_mean_var


class GenSModel:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        if cfg.feature_network.backbone == "mnasnet":
            from gens_tpu.models.mnasnet import MnasNetFeatureNetwork

            self.feature_net = MnasNetFeatureNetwork(cfg.feature_network)
        else:
            self.feature_net = FeatureNetwork(cfg.feature_network)
        self.adaptive_agg = (AdaptiveAgg(n_scales=len(cfg.volume.volume_dims))
                             if cfg.volume.agg == "adaptive" else None)
        self.reg_net = RegNetwork(cfg.reg_network)
        self.sdf_net = SDFNetwork(cfg.sdf_network)
        if cfg.color_network.head == "idr":
            from gens_tpu.models.rendering_net import RenderingNetwork

            self.blending_net = RenderingNetwork(
                d_feature=cfg.sdf_network.d_out - 1,
                mode=cfg.color_network.idr_mode,
                d_hidden=cfg.color_network.idr_d_hidden,
                n_layers=cfg.color_network.idr_n_layers,
                multires_view=cfg.color_network.idr_multires_view)
        else:
            self.blending_net = BlendingNetwork(cfg.color_network)
        self.variance_net = SingleVarianceNetwork(cfg.variance_network.init_val)
        self.renderer = Renderer(
            self.sdf_net, self.blending_net, self.variance_net, cfg.render,
            color_head=cfg.color_network.head)

    # -- initialization ----------------------------------------------------

    def init_params(self, key, n_src_views: int = 4) -> Dict[str, Any]:
        kf, km, kr, ks, kb, kv = jax.random.split(key, 6)
        dummy_imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
        feature_params = self.feature_net.init(kf, dummy_imgs)
        if self.cfg.feature_network.pretrained_path:
            import pickle

            with open(self.cfg.feature_network.pretrained_path, "rb") as f:
                pretrained = pickle.load(f)
            feature_params = dict(feature_params)
            feature_params["params"] = dict(feature_params["params"])
            feature_params["params"]["encoder"] = pretrained["params"]
            feature_params["batch_stats"] = {
                "encoder": pretrained["batch_stats"]}

        n_scales = len(self.cfg.volume.volume_dims)
        c_feat = self.cfg.feature_network.d_out[0]
        # mean‖var emits 2C channels per scale; adaptive emits C
        c_vol = c_feat if self.adaptive_agg is not None else 2 * c_feat
        dummy_vols = [
            jnp.zeros((64 >> i, 64 >> i, 64 >> i, c_vol), jnp.float32)
            for i in range(n_scales)
        ]
        reg_params = self.reg_net.init(kr, [v[None] for v in dummy_vols])

        c_out = self.cfg.reg_network.d_out[0]
        dummy_ref_vols = [
            jnp.zeros((4, 4, 4, c_out), jnp.float32) for _ in range(n_scales)
        ]
        sdf_params = self.sdf_net.init(ks, jnp.zeros((2, 3)), dummy_ref_vols)

        if self.cfg.color_network.head == "idr":
            d_lat = self.cfg.sdf_network.d_out - 1
            blending_params = self.blending_net.init(
                kb, jnp.zeros((2, 3)), jnp.zeros((2, 3)),
                jnp.zeros((2, 3)), jnp.zeros((2, d_lat)))
        else:
            d_feat_total = sum(self.cfg.reg_network.d_out)
            blending_params = self.blending_net.init(
                kb,
                jnp.zeros((2, n_src_views, 3 + d_feat_total)),
                jnp.zeros((2, n_src_views, 4)),
                jnp.ones((2, n_src_views), bool),
            )
        variance_params = self.variance_net.init(kv)

        if self.adaptive_agg is not None:
            dummy_feats = [
                jnp.zeros((2, 32 >> i, 32 >> i, c_feat), jnp.float32)
                for i in range(n_scales)
            ]
            agg_params = self.adaptive_agg.init(
                km, dummy_feats, jnp.eye(3)[None].repeat(2, 0),
                jnp.eye(4)[None].repeat(2, 0),
                tuple(4 for _ in range(n_scales)))
            out = {
                "feature": feature_params,
                "match_feature": jax.tree.map(jnp.copy, feature_params),
                "agg": agg_params,
                "reg": reg_params,
                "sdf": sdf_params,
                "blending": blending_params,
                "variance": variance_params,
            }
        else:
            out = {
                "feature": feature_params,
                "match_feature": jax.tree.map(jnp.copy, feature_params),
                "reg": reg_params,
                "sdf": sdf_params,
                "blending": blending_params,
                "variance": variance_params,
            }
        # Normalize every leaf to a STRONG dtype. Initializers built from
        # python scalars (e.g. the geometric init's jnp.full sphere bias)
        # emit weak-typed f32 leaves; one optimizer step then returns
        # strong-typed arrays, flipping the train-step's argument signature
        # and RETRACING it — measured as 3 x ~125 s of recompiles in the
        # first three Runner steps at the 256^3 reference scale (the weak
        # param flips at step 1, Adam's mu/nu at step 2).
        return jax.tree.map(lambda x: jnp.asarray(x, x.dtype), out)

    # -- scene construction (generalizable regime) -------------------------

    def extract_features(self, params, imgs, match: bool = False):
        sub = params["match_feature" if match else "feature"]
        feats = self.feature_net.apply(sub, imgs)
        return jax.lax.stop_gradient(feats) if match else feats

    def build_volumes(self, params, features, intrs, c2ws,
                      axis_name: Optional[str] = None,
                      view_valid: Optional[jnp.ndarray] = None):
        if self.adaptive_agg is not None:
            raw_vols, mask_vols = self.adaptive_agg.apply(
                params["agg"], features, intrs, c2ws,
                self.cfg.volume.volume_dims,
                min_vis_view=self.cfg.volume.min_vis_view)
        else:
            raw_vols, mask_vols = agg_mean_var(
                features, intrs, c2ws, self.cfg.volume.volume_dims,
                min_vis_view=self.cfg.volume.min_vis_view,
                axis_name=axis_name, view_valid=view_valid,
                out_dtype=(jnp.bfloat16 if self.cfg.volume.dtype == "bfloat16"
                           else None),
                packed_bilerp=self.cfg.volume.packed_bilerp,
                splat_window=self.cfg.volume.splat_window,
                splat_impl=self.cfg.volume.splat_impl,
                splat_mm_dtype=self.cfg.volume.splat_mm_dtype,
                agg_remat=self.cfg.volume.agg_remat)
        # remat: the U-Net's 256³ activations are cheap to recompute (~60 ms)
        # and expensive to keep across the whole render backward (~2 GB)
        reg_apply = jax.checkpoint(
            lambda p, vols: self.reg_net.apply(p, [v[None] for v in vols]))
        reg_out = reg_apply(params["reg"], list(raw_vols))
        volumes = [v[0] for v in reg_out]
        return volumes, mask_vols

    def build_scene(self, params, imgs, intrs, c2ws,
                    axis_name: Optional[str] = None,
                    view_valid: Optional[jnp.ndarray] = None) -> Scene:
        features = self.extract_features(params, imgs)
        match_features = self.extract_features(params, imgs, match=True)
        volumes, mask_vols = self.build_volumes(
            params, features, intrs, c2ws, axis_name, view_valid)
        from gens_tpu.ops.interp import (combine_mask_cascade,
                                         pack_cascade_fused,
                                         pack_cascade_supercell,
                                         pack_image_pyramid_fused,
                                         pack_supercell2d)

        mask_any = combine_mask_cascade(mask_vols)
        sdt = (jnp.bfloat16
               if self.cfg.sdf_network.volume_dtype == "bfloat16" else None)
        packed = fused = None
        if self.cfg.sdf_network.fused_packed:
            # ONE gather buffer for all scales + the mask volume
            # (inference/no-grad paths); supersedes the per-scale tables
            fused = pack_cascade_fused(volumes, mask_any=mask_any, dtype=sdt)
        elif self.cfg.sdf_network.packed_trilerp:
            # pack once per scene; every SDF lookup (sampling rounds, render
            # core, derivatives) then uses one wide gather per scale
            packed = pack_cascade_supercell(volumes, dtype=sdt)
        packed_feats = packed_imgs = packed_warp = packed_match_warp = None
        fused_pyr = None
        if self.cfg.color_network.packed_bilerp:
            from gens_tpu.models.renderer import make_warp_feature_stack

            pdt = (jnp.bfloat16
                   if self.cfg.color_network.packed_dtype == "bfloat16"
                   else None)
            if self.cfg.color_network.fused_pyramid:
                fused_pyr = pack_image_pyramid_fused(features, imgs,
                                                     dtype=pdt)
            else:
                packed_feats = [pack_supercell2d(f, dtype=pdt)
                                for f in features]
                packed_imgs = pack_supercell2d(imgs, dtype=pdt)
            # MFC warp stacks are detached even in training
            # (implicit_surface.py:313-326)
            n_warp = self.cfg.render.warp_scales
            packed_warp = pack_supercell2d(jax.lax.stop_gradient(
                make_warp_feature_stack(features, n_warp)), dtype=pdt)
            packed_match_warp = pack_supercell2d(jax.lax.stop_gradient(
                make_warp_feature_stack(match_features, n_warp)), dtype=pdt)
        return Scene(
            volumes=volumes, mask_volumes=mask_vols, features=features,
            match_features=match_features, imgs=imgs, intrs=intrs, c2ws=c2ws,
            mask_any=mask_any, packed_volumes=packed,
            packed_features=packed_feats, packed_imgs=packed_imgs,
            packed_warp=packed_warp, packed_match_warp=packed_match_warp,
            fused_cascade=fused, fused_pyramid=fused_pyr)

    # -- forward -----------------------------------------------------------

    def forward_train(self, params, inputs: Dict, cos_anneal_ratio,
                      use_match_features: bool, key,
                      axis_name: Optional[str] = None) -> Dict:
        """One training forward: build scene + render the ray batch.

        inputs: imgs (V,H,W,3), intrs (V,3,3), c2ws (V,4,4), rays_o/rays_d
        (R,3), near/far (R,1) or (1,1), optional pseudo_pts (P,3).
        """
        scene = self.build_scene(
            params, inputs["imgs"], inputs["intrs"], inputs["c2ws"],
            axis_name=axis_name)
        outputs = self.renderer.render(
            params, inputs["rays_o"], inputs["rays_d"],
            inputs["near"], inputs["far"], scene,
            cos_anneal_ratio=cos_anneal_ratio,
            use_match_features=use_match_features, key=key, train=True)
        if "pseudo_pts" in inputs:
            outputs["pseudo_sdf"] = self.renderer.pseudo_sdf(
                params, scene, inputs["pseudo_pts"])
        return outputs

    # -- finetune regime (volumes as parameters, gens.py:63-85) ------------

    def init_volumes(self, params, imgs, intrs, c2ws):
        """One-shot volume build from ALL scene views; returns the pieces
        that become the finetune state: trainable volumes + frozen masks and
        features (reference init_volumes, gens.py:63-85)."""
        features = self.extract_features(params, imgs)
        volumes, mask_vols = self.build_volumes(params, features, intrs, c2ws)
        volumes = [jax.lax.stop_gradient(v) for v in volumes]
        features = [jax.lax.stop_gradient(f) for f in features]
        return volumes, mask_vols, features

    def filter_volume(self, params, volumes, mask_volumes,
                      thresh: float = 0.1):
        """Narrow-band mask pruning: keep only voxels whose SDF magnitude is
        below ``thresh`` (dilated by one voxel), inside the unit sphere.

        Re-design of the reference's implemented-but-disabled
        ``GenS.filter_volume`` (models/gens.py:87-122, call site commented at
        gens.py:73): evaluate the SDF on the finest cascade grid in chunks,
        threshold, 3³ max-pool dilate, then AND into every cascade mask with
        nearest 2x downsampling between scales. Returns new mask_volumes."""
        from gens_tpu.models.volume import voxel_grid

        dim = mask_volumes[0].shape[0]
        pts = voxel_grid(dim)  # (dim³, 3), x-major like the volumes
        chunk = min(pts.shape[0], 128 ** 3 // 8)
        n_chunks = (pts.shape[0] + chunk - 1) // chunk
        pad = n_chunks * chunk - pts.shape[0]
        pts_c = jnp.pad(pts, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)

        def eval_chunk(p):
            sdf = self.sdf_net.apply(params["sdf"], p, volumes,
                                     method=SDFNetwork.sdf)
            return (jnp.abs(sdf) < thresh).astype(jnp.float32)

        band = jax.lax.map(eval_chunk, pts_c).reshape(-1)[:dim ** 3]
        inside = jnp.linalg.norm(pts, axis=-1) < 1.0
        mask = (band * inside).reshape(dim, dim, dim)
        # one-voxel dilation (F.max_pool3d(mask, 3, 1, 1), gens.py:114)
        mask = jax.lax.reduce_window(
            mask, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")

        out = []
        for m in mask_volumes:
            out.append(m * mask)
            mask = mask[::2, ::2, ::2]  # nearest 0.5x (gens.py:119)
        return out

    def forward_finetune(self, ft_params, static: Dict, inputs: Dict,
                         cos_anneal_ratio, key) -> Dict:
        """ft_params: {'volumes': [...], 'sdf', 'blending', 'variance'};
        static: {'mask_volumes': [...], 'features': [...]} (frozen).

        Per-step view subset selection (gens.py:148-153): features are
        gathered by ``inputs['view_ids']``.
        """
        view_ids = inputs["view_ids"]
        features = [jnp.take(f, view_ids, axis=0) for f in static["features"]]
        scene = Scene(
            volumes=ft_params["volumes"],
            mask_volumes=static["mask_volumes"],
            features=features,
            match_features=features,
            imgs=inputs["imgs"], intrs=inputs["intrs"], c2ws=inputs["c2ws"])
        params = {k: ft_params[k] for k in ("sdf", "blending", "variance")}
        outputs = self.renderer.render(
            params, inputs["rays_o"], inputs["rays_d"],
            inputs["near"], inputs["far"], scene,
            cos_anneal_ratio=cos_anneal_ratio,
            use_match_features=True, key=key, train=True)
        if "pseudo_pts" in inputs:
            outputs["pseudo_sdf"] = self.renderer.pseudo_sdf(
                params, scene, inputs["pseudo_pts"])
        return outputs
