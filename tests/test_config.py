"""Config tree: defaults parity with the reference conf, loader + overrides,
and the LR schedule shape."""

import json
import os
import tempfile

import numpy as np

from gens_tpu.config import Config, config_from_dict, load_config
from gens_tpu.train.schedule import cos_anneal_ratio, warmup_cosine_factor


def test_defaults_match_reference_conf():
    """Spot-check the defaults against confs/gens.conf values."""
    cfg = Config()
    assert cfg.model.volume.volume_dims == (256, 128, 64, 32, 16)
    assert cfg.model.sdf_network.d_hidden == 128
    assert cfg.model.sdf_network.d_out == 129
    assert cfg.model.sdf_network.skip_in == (3,)
    assert cfg.model.sdf_network.feat_channels == 20
    assert cfg.model.render.n_samples == 64
    assert cfg.model.render.n_importance == 64
    assert cfg.model.render.up_sample_steps == 4
    assert cfg.train.loss.sparse_scale_factor == 100.0
    assert cfg.train.loss.pseudo_depth_weight == 0.05
    assert cfg.train.lr_vol == (1e-4, 1e-3, 1e-3, 1e-2, 1e-2)
    assert cfg.train.epochs == 50


def test_load_config_yaml_and_overrides():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c.yaml")
        with open(path, "w") as f:
            f.write("train:\n  epochs: 7\nmodel:\n  render:\n    n_samples: 16\n")
        cfg = load_config(path, overrides=["train.lr_mlp=0.001",
                                           "model.volume.volume_dims=[8,4]"])
    assert cfg.train.epochs == 7
    assert cfg.model.render.n_samples == 16
    assert cfg.train.lr_mlp == 0.001
    assert cfg.model.volume.volume_dims == (8, 4)


def test_unknown_key_rejected():
    try:
        config_from_dict({"train": {"nonexistent": 1}})
    except KeyError:
        return
    raise AssertionError("unknown key accepted")


def test_warmup_cosine_factor():
    # linear warmup from 0.1, cosine decay to alpha (scheduler.py:5-9)
    f0 = float(warmup_cosine_factor(0.0, 50, 1.0, 0.02))
    np.testing.assert_allclose(f0, 0.1, rtol=1e-5)
    f_mid_warm = float(warmup_cosine_factor(0.5, 50, 1.0, 0.02))
    np.testing.assert_allclose(f_mid_warm, 0.55, rtol=1e-5)
    f1 = float(warmup_cosine_factor(1.0, 50, 1.0, 0.02))
    np.testing.assert_allclose(f1, 1.0, rtol=1e-5)
    f_end = float(warmup_cosine_factor(50.0, 50, 1.0, 0.02))
    np.testing.assert_allclose(f_end, 0.02, atol=1e-5)
    # monotone decreasing after warmup
    vals = [float(warmup_cosine_factor(e, 50, 1.0, 0.02))
            for e in np.linspace(1, 50, 20)]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))


def test_cos_anneal_ratio():
    assert cos_anneal_ratio(0.0, 0.0) == 1.0  # disabled
    assert cos_anneal_ratio(1.0, 2.0) == 0.5
    assert cos_anneal_ratio(5.0, 2.0) == 1.0
