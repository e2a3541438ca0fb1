"""Volume aggregation: against a manual numpy oracle, and the view-sharded
psum path against the single-device path (losslessness of the distribution,
SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gens_tpu.data.synthetic import look_at
from gens_tpu.models.volume import agg_mean_var, aggregate_scale, voxel_grid


def _cams(n, hw=(32, 32), f=40.0):
    H, W = hw
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2ws = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = 2.0 * np.array([np.cos(ang), np.sin(ang), 0.3], np.float32)
        c2ws.append(look_at(eye, np.zeros(3, np.float32)))
    return np.repeat(intr[None], n, 0), np.stack(c2ws)


def test_voxel_grid_layout():
    g = np.asarray(voxel_grid(3))
    assert g.shape == (27, 3)
    np.testing.assert_allclose(g[0], [-1, -1, -1])
    np.testing.assert_allclose(g[1], [-1, -1, 0])  # z fastest
    np.testing.assert_allclose(g[9], [0, -1, -1])  # x slowest
    np.testing.assert_allclose(g[-1], [1, 1, 1])


def test_aggregate_mean_var_oracle(rng):
    """Two views with constant feature maps: mean must equal the mean of the
    per-view constants on voxels seen by both, var the matching variance."""
    V, H, W, C = 2, 32, 32, 2
    intrs, c2ws = _cams(V, (H, W))
    feat = np.zeros((V, H, W, C), np.float32)
    feat[0] = 1.0
    feat[1] = 3.0

    vol, mask = aggregate_scale(jnp.asarray(feat), jnp.asarray(intrs),
                                jnp.asarray(c2ws), dim=8, scale_idx=0)
    vol, mask = np.asarray(vol), np.asarray(mask)
    both = mask > 0  # seen by >1 views = exactly 2 here
    assert both.sum() > 10
    np.testing.assert_allclose(vol[both][:, 0], 2.0, atol=1e-4)  # mean
    np.testing.assert_allclose(vol[both][:, C], 1.0, atol=1e-4)  # var

    # voxels behind every camera or out of frame: zero mask
    assert (mask >= 0).all() and (mask <= 1).all()


def test_cascade_shapes(rng):
    V = 3
    intrs, c2ws = _cams(V)
    feats = [jnp.asarray(rng.rand(V, 32 >> i, 32 >> i, 4).astype(np.float32))
             for i in range(3)]
    vols, masks = agg_mean_var(feats, jnp.asarray(intrs), jnp.asarray(c2ws),
                               volume_dims=(16, 8, 4))
    assert [v.shape for v in vols] == [(16, 16, 16, 8), (8, 8, 8, 8), (4, 4, 4, 8)]
    assert [m.shape for m in masks] == [(16,) * 3, (8,) * 3, (4,) * 3]


def test_view_sharded_aggregation_matches_single_device(rng):
    """Shard 6 real + 2 padded views over a 4-device 'view' axis; the psum
    triplet must reproduce the single-device result exactly."""
    V_real, V_pad = 6, 8
    intrs, c2ws = _cams(V_real)
    feat = rng.rand(V_real, 32, 32, 4).astype(np.float32)

    ref_vol, ref_mask = aggregate_scale(
        jnp.asarray(feat), jnp.asarray(intrs), jnp.asarray(c2ws),
        dim=8, scale_idx=0)

    # pad to 8 views
    feat_p = np.zeros((V_pad, 32, 32, 4), np.float32)
    feat_p[:V_real] = feat
    intrs_p = np.repeat(intrs[:1], V_pad, 0)
    intrs_p[:V_real] = intrs
    c2ws_p = np.repeat(np.eye(4, dtype=np.float32)[None], V_pad, 0)
    c2ws_p[:V_real] = c2ws
    valid = (np.arange(V_pad) < V_real).astype(np.float32)

    devices = np.array(jax.devices("cpu")[:4]).reshape(4)
    mesh = Mesh(devices, ("view",))

    def fn(feat_l, intrs_l, c2ws_l, valid_l):
        return aggregate_scale(feat_l, intrs_l, c2ws_l, dim=8, scale_idx=0,
                               axis_name="view", view_valid=valid_l)

    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P("view"), P("view"), P("view"), P("view")),
        out_specs=(P(), P()),
    )
    vol, mask = sharded(jnp.asarray(feat_p), jnp.asarray(intrs_p),
                        jnp.asarray(c2ws_p), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref_vol),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(ref_mask))


def test_packed_bilerp_aggregation_matches_plain(rng):
    """packed_bilerp=True must match the plain path exactly: volumes, masks,
    and the feature-map gradient (the packed-diff contract — forward reads
    the supercell table, backward scatters into the raw feature map)."""
    V, H, W, C = 3, 24, 20, 4
    dim = 8
    intrs, c2ws = _cams(V, (H, W), f=24.0)
    feat = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
    intrs = jnp.asarray(intrs)
    c2ws = jnp.asarray(c2ws)

    def run(packed):
        vol, mask = aggregate_scale(feat, intrs, c2ws, dim, 0,
                                    packed_bilerp=packed)
        return vol, mask

    vol_a, mask_a = run(False)
    vol_b, mask_b = run(True)
    np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))
    np.testing.assert_allclose(np.asarray(vol_a), np.asarray(vol_b),
                               atol=2e-5, rtol=2e-5)

    # gradient wrt the feature maps (the training direction)
    def loss(f, packed):
        vol, _ = aggregate_scale(f, intrs, c2ws, dim, 0,
                                 packed_bilerp=packed)
        return jnp.sum(vol * jnp.cos(jnp.arange(vol.size,
                                                dtype=jnp.float32)
                                     .reshape(vol.shape)))

    g_a = jax.grad(lambda f: loss(f, False))(feat)
    g_b = jax.grad(lambda f: loss(f, True))(feat)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               atol=2e-5, rtol=2e-5)


def test_view_sharded_packed_aggregation_matches_single_device(rng):
    """packed_bilerp under a sharded view axis: each device packs only its
    local views; the psum triplet must still match the single-device plain
    path exactly."""
    V_real, V_pad = 6, 8
    intrs, c2ws = _cams(V_real)
    feat = rng.rand(V_real, 32, 32, 4).astype(np.float32)

    ref_vol, ref_mask = aggregate_scale(
        jnp.asarray(feat), jnp.asarray(intrs), jnp.asarray(c2ws),
        dim=8, scale_idx=0)

    feat_p = np.zeros((V_pad, 32, 32, 4), np.float32)
    feat_p[:V_real] = feat
    intrs_p = np.repeat(intrs[:1], V_pad, 0)
    intrs_p[:V_real] = intrs
    c2ws_p = np.repeat(np.eye(4, dtype=np.float32)[None], V_pad, 0)
    c2ws_p[:V_real] = c2ws
    valid = (np.arange(V_pad) < V_real).astype(np.float32)

    devices = np.array(jax.devices("cpu")[:4]).reshape(4)
    mesh = Mesh(devices, ("view",))

    def fn(feat_l, intrs_l, c2ws_l, valid_l):
        return aggregate_scale(feat_l, intrs_l, c2ws_l, dim=8, scale_idx=0,
                               axis_name="view", view_valid=valid_l,
                               packed_bilerp=True)

    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P("view"), P("view"), P("view"), P("view")),
        out_specs=(P(), P()),
    )
    vol, mask = sharded(jnp.asarray(feat_p), jnp.asarray(intrs_p),
                        jnp.asarray(c2ws_p), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref_vol),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(ref_mask))


def test_table_grad_aggregation_matches_plain(rng):
    """packed_bilerp="table" (differentiate THROUGH the supercell table:
    scatter into table rows + pack-conv transpose) must match the plain
    path: values, masks, and feature-map gradients."""
    V, H, W, C = 3, 24, 20, 4
    dim = 8
    intrs, c2ws = _cams(V, (H, W), f=24.0)
    feat = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
    intrs = jnp.asarray(intrs)
    c2ws = jnp.asarray(c2ws)

    vol_a, mask_a = aggregate_scale(feat, intrs, c2ws, dim, 0)
    vol_b, mask_b = aggregate_scale(feat, intrs, c2ws, dim, 0,
                                    packed_bilerp="table")
    np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))
    np.testing.assert_allclose(np.asarray(vol_a), np.asarray(vol_b),
                               atol=2e-5, rtol=2e-5)

    def loss(f, packed):
        vol, _ = aggregate_scale(f, intrs, c2ws, dim, 0,
                                 packed_bilerp=packed)
        return jnp.sum(vol * jnp.cos(jnp.arange(vol.size,
                                                dtype=jnp.float32)
                                     .reshape(vol.shape)))

    g_a = jax.grad(lambda f: loss(f, False))(feat)
    g_b = jax.grad(lambda f: loss(f, "table"))(feat)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               atol=2e-5, rtol=2e-5)


def test_table_bf16_aggregation(rng):
    """packed_bilerp="table_bf16": the forward reads a bf16 copy of the
    supercell table (values within bf16 rounding of "table") but every
    derivative targets the f32 table — feature-map gradients must be
    BIT-IDENTICAL to the "table" mode's."""
    V, H, W, C = 3, 24, 20, 4
    dim = 8
    intrs, c2ws = _cams(V, (H, W), f=24.0)
    feat = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
    intrs = jnp.asarray(intrs)
    c2ws = jnp.asarray(c2ws)

    vol_a, mask_a = aggregate_scale(feat, intrs, c2ws, dim, 0,
                                    packed_bilerp="table")
    vol_b, mask_b = aggregate_scale(feat, intrs, c2ws, dim, 0,
                                    packed_bilerp="table_bf16")
    np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))
    # values: bf16 rounding of the gathered table entries only
    np.testing.assert_allclose(np.asarray(vol_a), np.asarray(vol_b),
                               atol=2e-2, rtol=2e-2)

    def loss(f, packed):
        vol, _ = aggregate_scale(f, intrs, c2ws, dim, 0,
                                 packed_bilerp=packed)
        return jnp.sum(vol * jnp.cos(jnp.arange(vol.size,
                                                dtype=jnp.float32)
                                     .reshape(vol.shape)))

    g_a = jax.grad(lambda f: loss(f, "table"))(feat)
    g_b = jax.grad(lambda f: loss(f, "table_bf16"))(feat)
    # the var term multiplies cotangents by forward VALUES (vm), which carry
    # bf16 rounding — gradients match to that rounding, and the pure linear
    # (mean) path is exact
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               atol=5e-2, rtol=5e-2)


def test_agg_remat_save_gathers_identical_gradients(rng):
    """agg_remat="save_gathers" (checkpoint policy keeping the gathered
    values as residuals, skipping the backward re-gather) is a pure
    scheduling change — values AND gradients must be bit-identical to the
    default full-remat path, in both "table" and "pallas" modes."""
    V, H, W, C = 3, 48, 48, 4
    dim = 32  # divisible by 16 so the pallas mode runs its real path
    intrs, c2ws = _cams(V, (H, W), f=40.0)
    feat = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
    intrs = jnp.asarray(intrs)
    c2ws = jnp.asarray(c2ws)

    for mode in ("table", "pallas"):
        kw = dict(packed_bilerp=mode)
        if mode == "pallas":
            from gens_tpu.ops.pallas_splat import required_window

            kw["splat_window"] = tuple(
                max(w, 16) for w in required_window(
                    np.asarray(intrs), np.asarray(c2ws), dim, (H, W)))

        def loss(f, remat):
            vol, _ = aggregate_scale(f, intrs, c2ws, dim, 0,
                                     agg_remat=remat, **kw)
            return jnp.sum(vol * jnp.cos(
                jnp.arange(vol.size, dtype=jnp.float32).reshape(vol.shape)))

        v_full = jax.jit(lambda f: loss(f, "full"))(feat)
        v_save = jax.jit(lambda f: loss(f, "save_gathers"))(feat)
        np.testing.assert_array_equal(np.asarray(v_full), np.asarray(v_save))
        g_full = jax.jit(jax.grad(lambda f: loss(f, "full")))(feat)
        g_save = jax.jit(jax.grad(lambda f: loss(f, "save_gathers")))(feat)
        np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_save),
                                   rtol=2e-3, atol=1e-4)
        # "save_gathers_proj" (xy + mask residuals too: the backward's
        # projection subgraph DCEs away) — still a pure scheduling change
        v_proj = jax.jit(lambda f: loss(f, "save_gathers_proj"))(feat)
        np.testing.assert_array_equal(np.asarray(v_full), np.asarray(v_proj))
        g_proj = jax.jit(
            jax.grad(lambda f: loss(f, "save_gathers_proj")))(feat)
        np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_proj),
                                   rtol=2e-3, atol=1e-4)
