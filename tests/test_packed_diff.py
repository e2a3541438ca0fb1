"""Differentiable packed-lookup equivalence (ops/interp.py packed-diff chain).

Round-1 trained through the raw 8-narrow-gather trilerp because the supercell
pack conv's backward provokes a pathological XLA layout; the packed-diff
custom_jvp chain lets training read the packed tables while gradients scatter
into the raw layout. These tests pin the contract: values and every
derivative the training objective uses — d/dvolume, d/dpts, the Eikonal
composition (outer d/dvolume of inner d/dpts) and the smoothness composition
(outer d/dvolume of jvp-of-grad) — match the raw path to float tolerance, on
the primitive AND through the full train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gens_tpu.ops.interp import (DiffPackedCascade, PackedVolume, bilerp,
                                 bilerp_packed_diff, pack_supercell,
                                 pack_supercell2d, trilerp,
                                 trilerp_packed_diff)


@pytest.fixture(scope="module")
def vol_pts(rng_module):
    vol = jnp.asarray(rng_module.randn(9, 7, 8, 4).astype(np.float32))
    pts = jnp.asarray(
        rng_module.uniform(-1.15, 1.15, (64, 3)).astype(np.float32))
    return vol, pts


@pytest.fixture(scope="module")
def rng_module():
    return np.random.RandomState(0)


def _pk(vol):
    table, dims = pack_supercell(vol)
    return PackedVolume(jax.lax.stop_gradient(table), dims)


def test_value_exact(vol_pts):
    vol, pts = vol_pts
    raw = trilerp(vol, pts)
    pk = trilerp_packed_diff(vol, _pk(vol), pts)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(pk),
                               rtol=0, atol=1e-5)


def test_first_order_grads(vol_pts):
    vol, pts = vol_pts

    def loss_raw(v, p):
        return jnp.sum(jnp.sin(trilerp(v, p)) * 1.3)

    def loss_pk(v, p):
        return jnp.sum(jnp.sin(trilerp_packed_diff(v, _pk(v), p)) * 1.3)

    gv_raw, gp_raw = jax.grad(loss_raw, argnums=(0, 1))(vol, pts)
    gv_pk, gp_pk = jax.grad(loss_pk, argnums=(0, 1))(vol, pts)
    np.testing.assert_allclose(np.asarray(gv_raw), np.asarray(gv_pk),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_raw), np.asarray(gp_pk),
                               atol=1e-4)


def test_eikonal_composition(vol_pts):
    """Outer d/dvolume of inner d/dpts — the Eikonal-loss pattern."""
    vol, pts = vol_pts

    def eik(v, lookup):
        g = jax.grad(lambda p: lookup(v, p)[:, 0].sum())(pts)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    ge_raw = jax.grad(lambda v: eik(v, trilerp))(vol)
    ge_pk = jax.grad(
        lambda v: eik(v, lambda vv, p: trilerp_packed_diff(vv, _pk(vv), p))
    )(vol)
    scale = float(jnp.abs(ge_raw).max())
    np.testing.assert_allclose(np.asarray(ge_raw), np.asarray(ge_pk),
                               atol=1e-4 * max(scale, 1.0))


def test_smooth_composition(vol_pts):
    """Outer d/dvolume of jvp-of-grad — the smoothness-loss pattern
    (2nd order in pts x 1st order in volume)."""
    vol, pts = vol_pts

    def smooth(v, lookup):
        gfn = jax.grad(lambda p: lookup(v, p)[:, 0].sum())
        _, sm = jax.jvp(gfn, (pts,), (jnp.ones_like(pts),))
        return jnp.sum(sm ** 2)

    s_raw = smooth(vol, trilerp)
    s_pk = smooth(vol, lambda vv, p: trilerp_packed_diff(vv, _pk(vv), p))
    np.testing.assert_allclose(float(s_raw), float(s_pk), rtol=1e-5)

    gs_raw = jax.grad(lambda v: smooth(v, trilerp))(vol)
    gs_pk = jax.grad(
        lambda v: smooth(v, lambda vv, p: trilerp_packed_diff(vv, _pk(vv), p))
    )(vol)
    scale = float(jnp.abs(gs_raw).max())
    np.testing.assert_allclose(np.asarray(gs_raw), np.asarray(gs_pk),
                               atol=1e-4 * max(scale, 1.0))


def test_bilerp_packed_diff(rng_module):
    img = jnp.asarray(rng_module.randn(11, 13, 4).astype(np.float32))
    xy = jnp.asarray(
        rng_module.uniform(-1.5, 13.5, (64, 2)).astype(np.float32))
    p2 = pack_supercell2d(img[None])
    table = jax.lax.stop_gradient(p2.table[0])

    np.testing.assert_allclose(
        np.asarray(bilerp(img, xy)),
        np.asarray(bilerp_packed_diff(img, table, p2.dims, xy)), atol=1e-5)

    def l_raw(im, q):
        return jnp.sum(jnp.cos(bilerp(im, q)))

    def l_pk(im, q):
        return jnp.sum(jnp.cos(bilerp_packed_diff(im, table, p2.dims, q)))

    gi_raw, gq_raw = jax.grad(l_raw, argnums=(0, 1))(img, xy)
    gi_pk, gq_pk = jax.grad(l_pk, argnums=(0, 1))(img, xy)
    np.testing.assert_allclose(np.asarray(gi_raw), np.asarray(gi_pk),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gq_raw), np.asarray(gq_pk),
                               atol=1e-4)


def test_train_step_gradients_match_packed_vs_raw():
    """Full train-step gradients with packing enabled (f32 tables) match the
    unpacked step to float tolerance (the VERDICT r1 'Done' criterion)."""
    from tests.test_forward import tiny_config
    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.losses import compute_losses
    from gens_tpu.models.gens import GenSModel

    raw = make_scene(n_views=3, hw=(64, 64), n_rays=32)
    inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}

    cfg = tiny_config()
    model_raw = GenSModel(cfg.model)
    params = model_raw.init_params(jax.random.PRNGKey(0), n_src_views=2)

    cfg_pk = tiny_config()
    cfg_pk.model.sdf_network.packed_trilerp = True
    cfg_pk.model.color_network.packed_bilerp = True
    model_pk = GenSModel(cfg_pk.model)

    def grads_of(model):
        def loss_fn(p):
            out = model.forward_train(p, inputs, 0.5, False,
                                      jax.random.PRNGKey(1))
            return compute_losses(out, inputs, cfg.train.loss)["loss"]

        return jax.grad(loss_fn)(params)

    g_raw = grads_of(model_raw)
    g_pk = grads_of(model_pk)

    flat_raw, _ = jax.tree_util.tree_flatten(g_raw)
    flat_pk, _ = jax.tree_util.tree_flatten(g_pk)
    assert len(flat_raw) == len(flat_pk)
    for a, b in zip(flat_raw, flat_pk):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-3)
        np.testing.assert_allclose(a, b, atol=1e-4 * scale, rtol=1e-3)
