"""Exactness of the fused single-gather lookups (round-3 inference fast
path) against the plain implementations they replace.

The fused cascade/pyramid merge every per-scale (and mask / RGB) gather into
ONE take (ops/interp.py FusedCascade / FusedImagePyramid); numerically they
must match trilerp / bilerp / nearest3d bit-for-bit at f32 tables.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gens_tpu.ops.interp import (FusedCascade, combine_mask_cascade,
                                 lookup_cascade_fused, lookup_mask,
                                 lookup_volume_cascade, pack_cascade_fused,
                                 pack_image_pyramid_fused)
from gens_tpu.ops.projection import lookup_feature, lookup_feature_fused


def _cascade(key, dims=(16, 8, 4), C=4):
    vols = []
    for i, d in enumerate(dims):
        key, k = jax.random.split(key)
        vols.append(jax.random.normal(k, (d, d, d, C)))
    return vols


def _mask_cascade(key, dims=(16, 8, 4)):
    masks = []
    for d in dims:
        key, k = jax.random.split(key)
        masks.append((jax.random.uniform(k, (d, d, d)) > 0.4).astype(
            jnp.float32))
    return masks


def test_fused_cascade_matches_trilerp():
    key = jax.random.PRNGKey(0)
    vols = _cascade(key)
    masks = _mask_cascade(jax.random.PRNGKey(1))
    mask_any = combine_mask_cascade(masks)
    fc = pack_cascade_fused(vols, mask_any=mask_any)

    # points spanning inside, boundary, and outside the volume
    pts = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(2), (512, 3), minval=-0.999,
                           maxval=0.999),
        jax.random.uniform(jax.random.PRNGKey(3), (256, 3), minval=-1.4,
                           maxval=1.4),
        jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]),
    ])

    feats, mask = lookup_cascade_fused(fc, pts, with_mask=True)
    ref_feats = lookup_volume_cascade(vols, pts)
    ref_mask = lookup_mask(mask_any, pts)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref_feats),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))

    # no-mask variant
    feats2 = lookup_cascade_fused(fc, pts)
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(ref_feats),
                               rtol=0, atol=1e-5)


def test_fused_cascade_point_gradients():
    vols = _cascade(jax.random.PRNGKey(0), dims=(8, 4))
    fc = pack_cascade_fused(vols)
    pts = jax.random.uniform(jax.random.PRNGKey(5), (64, 3), minval=-0.9,
                             maxval=0.9)

    def f_fused(p):
        return jnp.sum(jnp.sin(lookup_cascade_fused(fc, p)))

    def f_plain(p):
        return jnp.sum(jnp.sin(lookup_volume_cascade(vols, p)))

    g1 = jax.grad(f_fused)(pts)
    g2 = jax.grad(f_plain)(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)


def test_fused_pyramid_matches_lookup_feature():
    key = jax.random.PRNGKey(0)
    V, C = 3, 4
    feats = []
    for i, hw in enumerate([(24, 32), (12, 16), (6, 8)]):
        key, k = jax.random.split(key)
        feats.append(jax.random.normal(k, (V,) + hw + (C,)))
    key, k1, k2, k3 = jax.random.split(key, 4)
    imgs = jax.random.normal(k1, (V, 24, 32, 3))
    intrs = jnp.array([[[20.0, 0, 16], [0, 20.0, 12], [0, 0, 1]]] * V)
    c2ws = []
    for v in range(V):
        ang = 0.3 * v
        R = jnp.array([[np.cos(ang), 0, np.sin(ang)],
                       [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]], jnp.float32)
        t = jnp.array([0.2 * v, 0.0, -3.0])
        c2ws.append(jnp.concatenate([
            jnp.concatenate([R, t[:, None]], axis=1),
            jnp.array([[0, 0, 0, 1.0]])], axis=0))
    c2ws = jnp.stack(c2ws)

    pts = jax.random.uniform(k2, (300, 3), minval=-1.0, maxval=1.0)

    fp = pack_image_pyramid_fused(feats, imgs)
    got_feat, got_rd, got_mask = lookup_feature_fused(pts, fp, intrs, c2ws)
    ref_feat, ref_rd, ref_mask = lookup_feature(pts, imgs, intrs, c2ws,
                                                feats)
    np.testing.assert_allclose(np.asarray(got_feat), np.asarray(ref_feat),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_rd), np.asarray(ref_rd),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(ref_mask))


def test_fused_render_matches_plain():
    """End-to-end: the fused-configured renderer reproduces the plain one
    (f32 tables so the comparison is exact up to contraction order)."""
    from gens_tpu.config import Config
    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.models.gens import GenSModel

    def small(cfg):
        m = cfg.model
        m.feature_network.d_enc = (8, 8, 8, 8, 8)
        m.volume.volume_dims = (32, 16, 8, 4, 2)
        m.sdf_network.d_hidden = 48
        m.sdf_network.n_layers = 4
        m.sdf_network.skip_in = (2,)
        m.sdf_network.d_out = 17
        m.render.n_samples = 8
        m.render.n_importance = 8
        m.render.up_sample_steps = 2
        m.render.patch_size = 3
        m.render.n_sparse_pts = 16
        return cfg

    cfg_plain = small(Config())
    cfg_fused = small(Config())
    cfg_fused.model.sdf_network.packed_trilerp = True
    cfg_fused.model.sdf_network.fused_packed = True
    cfg_fused.model.color_network.packed_bilerp = True
    cfg_fused.model.color_network.fused_pyramid = True
    # round-4 mixed mode: fused single-gather only for the hierarchical-
    # sampling probes, per-scale gathers in render_core
    cfg_mixed = small(Config())
    cfg_mixed.model.sdf_network.packed_trilerp = True
    cfg_mixed.model.sdf_network.fused_packed = True
    cfg_mixed.model.sdf_network.fused_sampling_only = True
    cfg_mixed.model.color_network.packed_bilerp = True

    raw = make_scene(n_views=3, hw=(32, 64), n_rays=32)
    inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}

    outs = []
    for cfg in (cfg_plain, cfg_fused, cfg_mixed):
        model = GenSModel(cfg.model)
        params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
        scene = model.build_scene(params, inputs["imgs"], inputs["intrs"],
                                  inputs["c2ws"])
        out = model.renderer.render(
            params, inputs["rays_o"], inputs["rays_d"], inputs["near"],
            inputs["far"], scene, cos_anneal_ratio=1.0,
            use_match_features=False, key=None, train=False)
        outs.append(out)

    for k in ("color_fine", "render_depth", "sdf_depth", "normal",
              "weight_sum"):
        for other in outs[1:]:
            np.testing.assert_allclose(
                np.asarray(outs[0][k]), np.asarray(other[k]),
                rtol=1e-4, atol=2e-4, err_msg=k)
