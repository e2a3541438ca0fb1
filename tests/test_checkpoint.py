"""Checkpoint round-trips: orbax directory format, pickle fallback, format
auto-detection, version tagging (reference has two ad-hoc torch.save
formats, runner.py:124-132 + gens.py:54-61)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from gens_tpu.train.checkpoint import (CKPT_FORMAT_VERSION, latest_checkpoint,
                                       load_checkpoint, save_checkpoint)


@pytest.fixture
def payload():
    return {"epoch": 3, "step": 7,
            "params": {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}}


def test_orbax_roundtrip(payload, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    p = os.path.join(tmp_path, "ckpts", "model_003.ckpt")
    save_checkpoint(p, payload)
    assert os.path.isdir(p)  # orbax writes a checkpoint DIRECTORY
    back = load_checkpoint(p)
    assert int(back["epoch"]) == 3 and int(back["step"]) == 7
    assert int(back["format_version"]) == CKPT_FORMAT_VERSION
    np.testing.assert_array_equal(np.asarray(back["params"]["a"]),
                                  np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(back["params"]["b"]["c"]),
                                  np.ones((2, 3)))


def test_pickle_roundtrip_and_v1_compat(payload, tmp_path):
    p = os.path.join(tmp_path, "ckpts", "model_000.ckpt")
    save_checkpoint(p, payload, use_orbax=False)
    assert os.path.isfile(p)
    back = load_checkpoint(p)
    assert back["format_version"] == CKPT_FORMAT_VERSION

    # round-1 checkpoints carry no tag; loader must default to version 1
    import pickle

    p1 = os.path.join(tmp_path, "ckpts", "legacy.ckpt")
    with open(p1, "wb") as f:
        pickle.dump({"epoch": 0, "params": {}}, f)
    assert load_checkpoint(p1)["format_version"] == 1


def test_orbax_target_restores_namedtuple_structure(tmp_path):
    """Orbax serializes NamedTuples (optax opt_state) as plain dicts;
    restoring with a target payload must give back the ORIGINAL pytree
    structure or the resumed train step fails structure matching
    (runner.py train resume path)."""
    pytest.importorskip("orbax.checkpoint")
    import jax
    import optax

    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros(2)}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    payload = {"epoch": 1, "step": 5, "params": params,
               "opt_state": opt_state}
    p = os.path.join(tmp_path, "ckpts", "model_001.ckpt")
    save_checkpoint(p, payload)

    # without target: NamedTuple structure is lost (documented behavior)
    flat = load_checkpoint(p)
    assert (jax.tree_util.tree_structure(flat["opt_state"])
            != jax.tree_util.tree_structure(opt_state))

    # with target: exact structure back, and the restored state is usable
    back = load_checkpoint(p, target={
        "epoch": 0, "step": 0, "format_version": 0,
        "params": params, "opt_state": opt_state})
    assert (jax.tree_util.tree_structure(back["opt_state"])
            == jax.tree_util.tree_structure(opt_state))
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, back["opt_state"], back["params"])
    assert jax.tree_util.tree_structure(updates) \
        == jax.tree_util.tree_structure(params)


def test_latest_checkpoint_orders(tmp_path):
    """'Latest' is by mtime: a preemption checkpoint written after
    model_002 must win, but once a NEWER epoch checkpoint lands the stale
    preempt.ckpt must lose (lexical order would rank it first forever)."""
    d = os.path.join(tmp_path, "ckpts")
    for i in (0, 1, 2):
        save_checkpoint(os.path.join(d, f"model_{i:03d}.ckpt"),
                        {"epoch": i}, use_orbax=False)
        os.utime(os.path.join(d, f"model_{i:03d}.ckpt"), (1000 + i, 1000 + i))
    assert latest_checkpoint(d).endswith("model_002.ckpt")

    p = os.path.join(d, "preempt.ckpt")
    save_checkpoint(p, {"epoch": 1}, use_orbax=False)
    os.utime(p, (1010, 1010))
    assert latest_checkpoint(d).endswith("preempt.ckpt")

    save_checkpoint(os.path.join(d, "model_003.ckpt"), {"epoch": 3},
                    use_orbax=False)
    os.utime(os.path.join(d, "model_003.ckpt"), (1020, 1020))
    assert latest_checkpoint(d).endswith("model_003.ckpt")

    assert latest_checkpoint(os.path.join(tmp_path, "nope")) is None
