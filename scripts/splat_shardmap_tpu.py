"""Trace + execute the Mosaic splat kernel UNDER shard_map on the real TPU
chip (VERDICT r04 missing #2 / next #3): every real-TPU training run so far
was plain-jit, and the multichip dryrun's CPU mesh resolves the backward to
the jnp adjoint by design — so the exact program an N-chip TPU run would
build (splat_impl="kernel" inside a data x view shard_map) had never been
traced on any platform.

A 1x1 (data x view) mesh over the single available chip exercises that
program end-to-end: shard_map's vma checking sees the kernel's custom VJP,
and losses + parameter updates are pinned against the plain-jit step of the
same model (same contract as tests/test_sharded.py::
test_pallas_agg_under_shard_map, bf16-forward tolerance vs "table" mode).

    python scripts/splat_shardmap_tpu.py --out SPLAT_SHARDMAP_r05.json
"""

import argparse
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="auto",
                   help="splat_impl for the sharded step ('auto' resolves "
                        "against the mesh platform — must pick the kernel "
                        "on TPU)")
    p.add_argument("--out", default="SPLAT_SHARDMAP_r05.json")
    args = p.parse_args()

    import jax

    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    import jax.numpy as jnp

    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.models.gens import GenSModel
    from gens_tpu.parallel.sharded import (make_mesh, make_sharded_train_step,
                                           pad_views)
    from gens_tpu.train.step import init_train_state, make_train_step
    from tests.test_forward import tiny_config

    dev = jax.devices()[0]
    out = {"device": str(dev), "platform": dev.platform}
    print("device:", dev, "platform:", dev.platform, flush=True)

    cfg = tiny_config()
    cfg.model.render.perturb = 0.0
    cfg.train.loss.sparse_weight = 0.0

    cfg_p = dc.replace(cfg)
    cfg_p.model = dc.replace(cfg.model)
    cfg_p.model.volume = dc.replace(
        cfg.model.volume, packed_bilerp="pallas", splat_window=(64, 64),
        splat_impl=args.impl, agg_remat="save_gathers")
    model_p = GenSModel(cfg_p.model)

    cfg_t = dc.replace(cfg)
    cfg_t.model = dc.replace(cfg.model)
    cfg_t.model.volume = dc.replace(cfg.model.volume, packed_bilerp="table")
    model_t = GenSModel(cfg_t.model)

    scene = make_scene(n_views=3, hw=(64, 64), n_rays=32)
    inputs = {k: jnp.asarray(v) for k, v in scene.items() if k != "radius"}

    state, _ = init_train_state(model_p, cfg_p, jax.random.PRNGKey(0),
                                steps_per_epoch=1)
    _, single_step = make_train_step(model_t, cfg_t, steps_per_epoch=1)
    key = jax.random.PRNGKey(7)
    state1, metrics1 = single_step(state, inputs, key, 1.0, False)
    jax.block_until_ready(metrics1["loss"])

    mesh = make_mesh(1, 1, np.asarray([dev]))
    batched = {k: jnp.stack([v]) for k, v in inputs.items()}
    batched, n_views = pad_views(batched, mesh.shape["view"])
    sharded_step = make_sharded_train_step(model_p, cfg_p, mesh,
                                           n_views=n_views)
    out["resolved_impl"] = cfg_p.model.volume.splat_impl
    print("resolved splat_impl:", out["resolved_impl"], flush=True)
    state2, metrics2 = sharded_step(state, batched, key, 1.0, False)

    out["metrics_plainjit_table"] = {
        k: round(float(metrics1[k]), 6)
        for k in ("loss", "color_loss", "eikonal_loss", "mfc_loss")}
    out["metrics_shardmap_pallas"] = {
        k: round(float(metrics2[k]), 6)
        for k in ("loss", "color_loss", "eikonal_loss", "mfc_loss")}

    ok = True
    for k in ("loss", "color_loss", "eikonal_loss", "mfc_loss"):
        a, b = float(metrics1[k]), float(metrics2[k])
        if not np.isclose(a, b, rtol=2e-2, atol=2e-3):
            ok = False
            print(f"metric {k} mismatch: {a} vs {b}", flush=True)
    max_rel = 0.0
    for (p1, p2) in zip(jax.tree_util.tree_leaves(state1.params["sdf"]),
                        jax.tree_util.tree_leaves(state2.params["sdf"])):
        a, b = np.asarray(p1), np.asarray(p2)
        denom = np.maximum(np.abs(a), 1e-3)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
        if not np.allclose(a, b, rtol=2e-2, atol=2e-3):
            ok = False
    out["sdf_update_max_rel_diff"] = round(max_rel, 6)
    out["kernel_traced_under_shard_map"] = out["resolved_impl"] in (
        "kernel", "kernel2", "kernel2f")
    out["ok"] = bool(ok)
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
