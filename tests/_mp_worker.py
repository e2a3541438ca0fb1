"""Subprocess worker for the multi-process (multi-host simulation) test.

Each process: initialize the JAX distributed runtime over localhost,
construct the GLOBAL ('data', 'view') mesh, load ONLY its own data rows,
assemble process-local arrays, run one sharded train step, and dump the
metrics + a parameter digest to a JSON file. Two processes x 2 local CPU
devices = a 4-device 2-host cluster on one machine.

Invoked by tests/test_multiprocess.py:
    python tests/_mp_worker.py <rank> <world> <port> <outfile>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank, world, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gens_tpu.parallel.distributed import (ProcessEnv, initialize,
                                               is_main_process,
                                               local_data_rows,
                                               make_process_local_array)

    initialize(ProcessEnv(rank, world, f"localhost:{port}"))
    assert jax.process_count() == world
    assert len(jax.devices()) == 2 * world

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
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

    n_data, n_view = 2, 2
    mesh = make_mesh(n_data, n_view)  # spans both processes
    rows = local_data_rows(mesh)
    assert len(rows) == 1, rows  # each host owns exactly one scene row

    raw = make_scene(n_views=3, hw=(64, 64), n_rays=32, seed=0)
    single = {k: np.asarray(v) for k, v in raw.items()
              if k not in ("radius", "view_masks")}
    batched = {k: np.stack([v] * n_data) for k, v in single.items()}
    batched, n_views = pad_views(batched, n_view)

    dv_keys = ("imgs", "intrs", "c2ws", "view_valid", "rays_o", "rays_d",
               "color")
    assembled = {
        k: make_process_local_array(
            mesh, P("data", "view") if k in dv_keys else P("data"),
            (n_data,) + v.shape[1:], v[rows])
        for k, v in batched.items()
    }

    state, _ = init_train_state(model, cfg, jax.random.PRNGKey(0),
                                steps_per_epoch=1)
    step_fn = make_sharded_train_step(model, cfg, mesh, n_views=n_views)
    state, metrics = step_fn(state, assembled, jax.random.PRNGKey(7), 1.0,
                             use_match_features=False)

    # params are replicated -> fully addressable on every process
    leaves = jax.tree_util.tree_leaves(state.params["sdf"])
    digest = float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))
    out = {"rank": rank, "is_main": is_main_process(),
           "loss": float(metrics["loss"]),
           "color_loss": float(metrics["color_loss"]),
           "eikonal_loss": float(metrics["eikonal_loss"]),
           "sdf_param_digest": digest}

    # -- multi-host validation: each process renders only ITS scenes
    # (round-robin partition) and the merged metrics agree across hosts
    # (the DDP-rank scene split of reference runner.py:199-282)
    import glob

    from gens_tpu.data.synthetic import SyntheticDataset
    from gens_tpu.runner import Runner

    cfg.mesh_resolution = 16
    cfg.base_exp_dir = outfile + f".val_rank{rank}"
    cfg.mode = "val"
    runner = Runner(cfg)
    dataset = SyntheticDataset(n_scenes=2, hw=(64, 64), val_res_level=8,
                               mode="val")
    val = runner.validate(state.params, epoch=0, dataset=dataset)
    rendered = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(runner.exp_dir, "val_img", "*.png")))
    out["val_psnr"] = float(val["psnr"])
    out["val_color_loss"] = float(val["color_loss"])
    out["val_rendered"] = rendered

    with open(outfile, "w") as f:
        json.dump(out, f)
    print("worker", rank, "done", flush=True)


if __name__ == "__main__":
    main()
