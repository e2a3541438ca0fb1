"""TRUE multi-host validation on one machine: two OS processes, each with 2
virtual CPU devices, joined into one 4-device cluster via
``jax.distributed.initialize`` — the closest thing to a 2-host TPU pod this
environment can express (the reference only ever validated its DDP path by
launching 2 real processes, scripts/run.sh:3; so do we).

Covers: coordinator rendezvous, global mesh spanning processes, per-host
data-row loading, ``make_array_from_process_local_data`` assembly, the
cross-host psum/pmean in the sharded train step, and replicated-result
agreement. The result must also match the same step run single-process on a
4-device virtual mesh (lossless distribution).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_step(tmp_path):
    port = _free_port()
    outs = [os.path.join(tmp_path, f"rank{r}.json") for r in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_mp_worker.py"),
             str(r), "2", str(port), outs[r]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)
    ]
    logs = [p.communicate(timeout=1200)[0].decode() for p in procs]
    for r, p in enumerate(procs):
        assert p.returncode == 0, f"rank {r} failed:\n{logs[r][-3000:]}"

    results = [json.load(open(o)) for o in outs]
    assert results[0]["is_main"] and not results[1]["is_main"]

    # both hosts observe the identical (replicated) loss and updated params
    for k in ("loss", "color_loss", "eikonal_loss", "sdf_param_digest"):
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=1e-6), k
    assert np.isfinite(results[0]["loss"])

    # multi-host validation: scenes partitioned (each rank rendered exactly
    # one of the two, disjointly) and merged metrics agree on every host
    r0, r1 = results[0]["val_rendered"], results[1]["val_rendered"]
    assert len(r0) == 1 and len(r1) == 1, (r0, r1)
    assert set(r0).isdisjoint(r1), (r0, r1)
    assert "sphere0" in r0[0] and "sphere1" in r1[0]
    for k in ("val_psnr", "val_color_loss"):
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=1e-6)
    assert np.isfinite(results[0]["val_psnr"])

    # and the distribution is lossless: same step on ONE process with a
    # 4-device virtual mesh gives the same loss
    import jax

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.models.gens import GenSModel
    from gens_tpu.parallel.sharded import (make_mesh, make_sharded_train_step,
                                           pad_views)
    from gens_tpu.train.step import init_train_state
    from tests.test_forward import tiny_config

    cfg = tiny_config()
    cfg.model.render.perturb = 0.0
    cfg.train.loss.sparse_weight = 0.0
    model = GenSModel(cfg.model)
    mesh = make_mesh(2, 2, jax.devices("cpu")[:4])

    raw = make_scene(n_views=3, hw=(64, 64), n_rays=32, seed=0)
    single = {k: jnp.asarray(v) for k, v in raw.items()
              if k not in ("radius", "view_masks")}
    batched = {k: jnp.stack([v] * 2) for k, v in single.items()}
    batched, n_views = pad_views(batched, 2)

    state, _ = init_train_state(model, cfg, jax.random.PRNGKey(0),
                                steps_per_epoch=1)
    step_fn = make_sharded_train_step(model, cfg, mesh, n_views=n_views)
    _, metrics = step_fn(state, batched, jax.random.PRNGKey(7), 1.0,
                         use_match_features=False)
    np.testing.assert_allclose(results[0]["loss"], float(metrics["loss"]),
                               rtol=2e-4)
