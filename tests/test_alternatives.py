"""Tests for the optional/alternative components: the reference's dead-code
paths made functional (SURVEY.md §7.5) — IDR rendering head, adaptive volume
aggregation, GlobalAttn bottleneck, RegNetworkLite, background-sphere lookups,
and narrow-band volume filtering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gens_tpu.config import Config, RegNetConfig
from gens_tpu.models.gens import GenSModel
from gens_tpu.models.reg_net import GlobalAttn, RegNetwork, RegNetworkLite
from gens_tpu.models.rendering_net import RenderingNetwork, rendering_input_dim
from gens_tpu.models.volume import AdaptiveAgg, agg_mean_var, voxel_grid
from gens_tpu.ops.projection import equirect2sphere, lookup_sphe_volume


def tiny_config() -> Config:
    cfg = Config()
    m = cfg.model
    m.feature_network.d_enc = (8, 8, 8, 8, 8)
    m.volume.volume_dims = (32, 16, 8, 4, 2)
    m.sdf_network.d_hidden = 48
    m.sdf_network.n_layers = 4
    m.sdf_network.skip_in = (2,)
    m.sdf_network.d_out = 17
    m.render.n_samples = 16
    m.render.n_importance = 16
    m.render.up_sample_steps = 2
    m.render.patch_size = 5
    m.render.n_sparse_pts = 64
    return cfg


@pytest.fixture(scope="module")
def scene_inputs():
    from gens_tpu.data.synthetic import make_scene

    s = make_scene(n_views=3, hw=(64, 64), n_rays=32)
    return {k: jnp.asarray(v) for k, v in s.items() if k != "radius"}


# -- IDR rendering head ------------------------------------------------------


@pytest.mark.parametrize("mode", ["idr", "no_view_dir", "no_normal"])
def test_rendering_network_modes(rng, mode):
    net = RenderingNetwork(d_feature=16, mode=mode, d_hidden=32, n_layers=3,
                           multires_view=2)
    pts = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    normals = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    dirs = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(10, 16).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), pts, normals, dirs, feats)
    rgb = net.apply(params, pts, normals, dirs, feats)
    assert rgb.shape == (10, 3)
    rgb = np.asarray(rgb)
    assert (rgb >= 0).all() and (rgb <= 1).all()  # sigmoid squeeze


def test_rendering_network_skip_and_dims(rng):
    net = RenderingNetwork(d_feature=8, d_hidden=24, n_layers=4,
                           skip_in=(2,), multires_view=0)
    pts = jnp.zeros((4, 3))
    params = net.init(jax.random.PRNGKey(0), pts, pts, pts, jnp.zeros((4, 8)))
    out = net.apply(params, pts, pts, pts, jnp.zeros((4, 8)))
    assert out.shape == (4, 3)
    assert rendering_input_dim("idr", 8, 0) == 3 + 3 + 3 + 8
    assert rendering_input_dim("no_view_dir", 8, 4) == 3 + 3 + 8
    assert rendering_input_dim("no_normal", 8, 1) == 3 + (3 + 6) + 8


def test_forward_train_idr_head(scene_inputs):
    cfg = tiny_config()
    cfg.model.color_network.head = "idr"
    cfg.model.color_network.idr_d_hidden = 32
    cfg.model.color_network.idr_n_layers = 2
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    out = model.forward_train(params, scene_inputs, 0.5, False,
                              jax.random.PRNGKey(1))
    R = scene_inputs["rays_o"].shape[0]
    assert out["color_fine"].shape == (R, 3)
    assert bool(np.asarray(out["valid_mask"]).all())
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite in {k}"


# -- adaptive (learned softmax) aggregation ----------------------------------


def _make_views(rng, n_views=3, hw=(16, 16), c=4):
    feats = [jnp.asarray(rng.rand(n_views, hw[0] >> i, hw[1] >> i, c)
                         .astype(np.float32)) for i in range(3)]
    intr = np.array([[8.0, 0, hw[1] / 2], [0, 8.0, hw[0] / 2], [0, 0, 1]],
                    np.float32)
    intrs = jnp.asarray(np.stack([intr] * n_views))
    c2ws = []
    for k in range(n_views):
        ang = 0.3 * k
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R
        c2w[:3, 3] = -R @ np.array([0, 0, -3], np.float32)
        c2ws.append(c2w)
    return feats, intrs, jnp.asarray(np.stack(c2ws))


def test_adaptive_agg_shapes_and_mask(rng):
    feats, intrs, c2ws = _make_views(rng)
    dims = (8, 4, 2)
    agg = AdaptiveAgg(n_scales=3, d_hidden=8)
    params = agg.init(jax.random.PRNGKey(0), feats, intrs, c2ws, dims)
    vols, masks = agg.apply(params, feats, intrs, c2ws, dims)
    assert len(vols) == len(masks) == 3
    for d, v, m in zip(dims, vols, masks):
        assert v.shape == (d, d, d, 4)  # C channels, not 2C
        assert m.shape == (d, d, d)
        assert np.isfinite(np.asarray(v)).all()
        assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}
    # masks should agree with the mean/var path's masks (same visibility)
    _, ref_masks = agg_mean_var(feats, intrs, c2ws, dims)
    for m, rm in zip(masks, ref_masks):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(rm))


def test_adaptive_agg_is_convex_combination(rng):
    # with identical features in every view, any softmax weighting returns
    # exactly that feature wherever at least one view sees the voxel
    feats, intrs, c2ws = _make_views(rng, n_views=3)
    const = [jnp.ones_like(f) * 0.7 for f in feats]
    dims = (8, 4, 2)
    agg = AdaptiveAgg(n_scales=3, d_hidden=8)
    params = agg.init(jax.random.PRNGKey(0), const, intrs, c2ws, dims)
    vols, _ = agg.apply(params, const, intrs, c2ws, dims)
    # visibility per voxel (any view)
    _, masks0 = agg_mean_var(const, intrs, c2ws, dims, min_vis_view=0)
    for v, m in zip(vols, masks0):
        seen = np.asarray(m) > 0
        vals = np.asarray(v)[seen]
        np.testing.assert_allclose(vals, 0.7, atol=1e-4)


def test_adaptive_agg_end_to_end(scene_inputs):
    cfg = tiny_config()
    cfg.model.volume.agg = "adaptive"
    # adaptive emits C (=4) channels per scale, not 2C
    cfg.model.reg_network.d_volume = (4, 4, 4, 4, 4)
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    assert "agg" in params
    out = model.forward_train(params, scene_inputs, 0.5, False,
                              jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["color_fine"])).all()


# -- GlobalAttn + RegNetworkLite ---------------------------------------------


def test_global_attn_shape(rng):
    x = jnp.asarray(rng.randn(4, 4, 4, 16).astype(np.float32))
    attn = GlobalAttn(d_ff=32, d_keys=8, d_values=8, n_heads=2)
    params = attn.init(jax.random.PRNGKey(0), x)
    y = attn.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_reg_network_global_attn_option(rng):
    cfg = RegNetConfig(d_volume=(8,) * 3, d_out=(4,) * 3, d_base=8,
                       use_global_attn=True)
    net = RegNetwork(cfg)
    dims = [16, 8, 4]
    vols = [jnp.asarray(rng.rand(1, d, d, d, 8).astype(np.float32))
            for d in dims]
    params = net.init(jax.random.PRNGKey(0), vols)
    outs = net.apply(params, vols)
    assert len(outs) == 3
    for d, o in zip(dims, outs):
        assert o.shape == (1, d, d, d, 4)
        assert np.isfinite(np.asarray(o)).all()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert any("GlobalAttn" in jax.tree_util.keystr(p) for p, _ in flat)


def test_reg_network_lite(rng):
    cfg = RegNetConfig(d_volume=(8,) * 3, d_out=(4,) * 3, d_base=8)
    net = RegNetworkLite(cfg)
    dims = [16, 8, 4]
    vols = [jnp.asarray(rng.rand(1, d, d, d, 8).astype(np.float32))
            for d in dims]
    params = net.init(jax.random.PRNGKey(0), vols)
    out = net.apply(params, vols)
    assert out.shape == (1, 16, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


# -- background-sphere lookups ------------------------------------------------


def test_equirect2sphere_closed_form():
    pts = jnp.asarray([
        [0.0, 0.0, 2.0],   # +z at r=2
        [4.0, 0.0, 0.0],   # +x at r=4
        [0.0, -1.0, 0.0],  # -y at r=1
    ])
    out = np.asarray(equirect2sphere(pts))
    np.testing.assert_allclose(out[0], [np.pi / 2, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.25], atol=1e-6)
    np.testing.assert_allclose(out[2], [0.0, -np.pi / 2, 1.0], atol=1e-6)


def test_equirect2sphere_clips_inside_sphere():
    # points inside the unit sphere are clipped to r=1 (projector.py:253)
    out = np.asarray(equirect2sphere(jnp.asarray([[0.0, 0.0, 0.1]])))
    np.testing.assert_allclose(out[0, 2], 1.0, atol=1e-6)


def test_lookup_sphe_volume_constant(rng):
    vol = jnp.full((4, 6, 5, 3), 2.5)
    pts = jnp.asarray(rng.randn(20, 3).astype(np.float32) * 2 + 3)
    sphe = equirect2sphere(pts)
    out = np.asarray(lookup_sphe_volume(sphe, vol))
    assert out.shape == (20, 3)
    np.testing.assert_allclose(out, 2.5, atol=1e-5)


# -- host-side mask-volume cleaning --------------------------------------------


def test_clean_volume_largest_component():
    from gens_tpu.utils.volume_tools import clean_volume

    m = np.zeros((8, 8, 8), np.float32)
    m[:3, :3, :3] = 1  # 27 voxels
    m[6:, 6:, 6:] = 1  # 8 voxels
    out = clean_volume(m)
    assert out.shape == m.shape
    assert out.sum() == 27
    assert out[0, 0, 0] == 1 and out[7, 7, 7] == 0
    # diagonal touch counts as connected (26-connectivity)
    d = np.zeros((4, 4, 4), np.float32)
    d[0, 0, 0] = d[1, 1, 1] = 1
    assert clean_volume(d).sum() == 2
    # empty volume passes through
    assert clean_volume(np.zeros((4, 4, 4), np.float32)).sum() == 0


# -- narrow-band volume filtering ---------------------------------------------


def test_filter_volume_narrow_band():
    cfg = tiny_config()
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    n_scales = len(cfg.model.volume.volume_dims)
    c_out = cfg.model.reg_network.d_out[0]
    dims = cfg.model.volume.volume_dims
    volumes = [jnp.zeros((d, d, d, c_out)) for d in dims]
    mask_volumes = [jnp.ones((d, d, d)) for d in dims]
    out = model.filter_volume(params, volumes, mask_volumes, thresh=0.1)
    assert len(out) == n_scales
    for d, m, orig in zip(dims, out, mask_volumes):
        assert m.shape == (d, d, d)
        arr = np.asarray(m)
        assert set(np.unique(arr)) <= {0.0, 1.0}
        # narrow band strictly prunes the all-ones mask (the geometric-init
        # SDF is sphere-like, so |sdf| > thresh far from the surface)
        assert arr.sum() < np.asarray(orig).sum()
    # pruned masks are a subset of the originals
    for m, orig in zip(out, mask_volumes):
        assert (np.asarray(m) <= np.asarray(orig)).all()


# -- supercell-packed trilerp end-to-end ---------------------------------------


def test_forward_train_packed_trilerp_matches_unpacked(scene_inputs):
    cfg = tiny_config()
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    out_ref = model.forward_train(params, scene_inputs, 0.5, False,
                                  jax.random.PRNGKey(1))

    cfg2 = tiny_config()
    cfg2.model.sdf_network.packed_trilerp = True
    cfg2.model.color_network.packed_bilerp = True
    model2 = GenSModel(cfg2.model)
    out_packed = model2.forward_train(params, scene_inputs, 0.5, False,
                                      jax.random.PRNGKey(1))

    for k in out_ref:
        np.testing.assert_allclose(
            np.asarray(out_ref[k]), np.asarray(out_packed[k]),
            atol=1e-4, rtol=1e-3, err_msg=k)
