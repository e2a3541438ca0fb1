"""Stage-level timing of the render path on the real chip.

Times each render_core stage in isolation so optimization effort goes where
the milliseconds are. The tunneled device makes per-dispatch timing lie, so
each stage runs ``iters`` times inside ONE jit via fori_loop (the same
pattern bench.py uses), with per-iteration input jitter so XLA cannot hoist
the loop body, and is timed around a host transfer of the accumulated
scalar. Stages share work when fused, so the stage sum exceeds end-to-end.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gens_tpu.utils.cache import enable_compile_cache
enable_compile_cache(jax)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gens_tpu.config import Config
from gens_tpu.data.synthetic import make_scene
from gens_tpu.models.gens import GenSModel
from gens_tpu.models.renderer import (scene_mask_any, scene_sdf_volumes,
                                      make_warp_feature_stack)
from gens_tpu.ops.interp import lookup_mask
from gens_tpu.ops.projection import lookup_feature, surface_patch_warp
from gens_tpu.ops.sampling import hierarchical_sample

ITERS = 20


def timeit(name, stage_fn, pts0, *ctx):
    """stage_fn: (pts (N,3), *ctx) -> array(s). Runs ITERS times inside one
    jit, jittering pts per iteration to defeat loop-invariant hoisting.
    ``ctx`` (params/scene/...) is passed as jit arguments so large arrays
    don't get baked into the HLO as constants (the remote compiler rejects
    oversized programs)."""

    @jax.jit
    def loop(pts0, *ctx):
        def body(i, acc):
            jitter = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0), i),
                pts0.shape, minval=-1e-4, maxval=1e-4)
            out = stage_fn(pts0 + jitter, *ctx)
            return acc + sum(jnp.sum(o.astype(jnp.float32))
                             for o in jax.tree_util.tree_leaves(out))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    float(np.asarray(loop(pts0, *ctx)))  # compile + warm
    t0 = time.time()
    val = float(np.asarray(loop(pts0, *ctx)))
    dt = (time.time() - t0) / ITERS * 1e3
    assert np.isfinite(val)
    print(f"{name:38s} {dt:8.2f} ms/iter")


def main():
    cfg = Config()
    cfg.model.sdf_network.volume_dtype = "bfloat16"
    cfg.model.sdf_network.packed_trilerp = True
    cfg.model.color_network.packed_bilerp = True
    n_views, hw, n_rays = 3, (480, 640), 1024
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=n_views - 1)
    raw = make_scene(n_views=n_views, hw=hw, n_rays=n_rays)
    inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}

    build = jax.jit(lambda p, i: model.build_scene(
        p, i["imgs"], i["intrs"], i["c2ws"]))
    scene = build(params, inputs)
    jax.block_until_ready(jax.tree_util.tree_leaves(scene.volumes))

    r = model.renderer
    rcfg = cfg.model.render
    mask_any = scene_mask_any(scene)

    def sample_stage(rays_o, params, scene, inputs):
        sdf_fn = r.sdf_fn(params, scene_sdf_volumes(scene))
        return hierarchical_sample(
            rays_o, inputs["rays_d"], inputs["near"], inputs["far"],
            lambda p: jax.lax.stop_gradient(sdf_fn(p)),
            jax.lax.stop_gradient(scene_mask_any(scene)),
            rcfg.n_samples, rcfg.n_importance, rcfg.up_sample_steps,
            perturb_key=None)

    timeit("hierarchical_sample (4 rounds)", sample_stage, inputs["rays_o"],
           params, scene, inputs)

    z_vals = jax.jit(sample_stage)(inputs["rays_o"], params, scene, inputs)
    pts = (inputs["rays_o"][:, None, :]
           + inputs["rays_d"][:, None, :] * z_vals[..., None]).reshape(-1, 3)

    timeit("sdf value+grad+smooth (R*S pts)",
           lambda q, p, s: r.sdf_value_grad_smooth(p, scene_sdf_volumes(s), q),
           pts, params, scene)
    timeit("sdf forward only (R*S pts)",
           lambda q, p, s: r.sdf.apply(p["sdf"], q, scene_sdf_volumes(s)),
           pts, params, scene)
    timeit("sdf grad only (R*S pts)",
           lambda q, p, s: r.sdf_gradient(p, scene_sdf_volumes(s), q),
           pts, params, scene)
    timeit("voxel-mask lookup (R*S pts)",
           lambda q, m: lookup_mask(m, q), pts, mask_any)

    def blend_stage(q, params, scene):
        rgb_feat, ray_diff, view_mask = lookup_feature(
            q, scene.imgs, scene.intrs, scene.c2ws, scene.features,
            packed_features=scene.packed_features,
            packed_imgs=scene.packed_imgs)
        return r.blending.apply(params["blending"], rgb_feat, ray_diff,
                                view_mask)

    timeit("lookup_feature + blending (R*S pts)", blend_stage, pts,
           params, scene)

    pts_surf = inputs["rays_o"] + inputs["rays_d"] * 0.5
    normals = pts_surf / jnp.linalg.norm(pts_surf, axis=-1, keepdims=True)
    wf = jax.jit(lambda s: make_warp_feature_stack(
        s.features, rcfg.warp_scales))(scene)

    timeit("patch warp (R pts)",
           lambda q, n, w, s: surface_patch_warp(
               q, n, w, s.intrs, s.c2ws, patch_size=rcfg.patch_size),
           pts_surf, normals, wf, scene)

    def e2e(rays_o, params, scene, inputs):
        return r.render(params, rays_o, inputs["rays_d"], inputs["near"],
                        inputs["far"], scene, cos_anneal_ratio=1.0,
                        use_match_features=False, key=jax.random.PRNGKey(0),
                        train=False)["color_fine"]

    timeit("render end-to-end", e2e, inputs["rays_o"], params, scene, inputs)


if __name__ == "__main__":
    main()
