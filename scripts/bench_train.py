"""Training-step throughput at reference scale (VERDICT r1 item: no ms/step
number existed anywhere; the reference's dominant cost is training —
50 epochs x ~3.6k steps, /root/reference/confs/gens.conf:36,
runner.py:139-197).

Honest methodology (PERF.md): K full optimizer steps inside ONE jit via
lax.scan carrying (params, opt_state) — the chained parameter dependency
forbids hoisting; the PRNG key is folded per iteration. Timed on the 2nd
call (compile excluded). Reports ms/step and rays/s for the packed-diff
fast path and the raw-gather path.

Usage (TPU ambient; --cpu for the virtual backend):
    python scripts/bench_train.py [--views 5] [--rays 512] [--dims 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(packed: bool, args):
    import jax
    import jax.numpy as jnp

    from gens_tpu.config import Config
    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.losses import compute_losses
    from gens_tpu.models.gens import GenSModel
    from gens_tpu.train.step import init_train_state, make_optimizer

    cfg = Config()
    m = cfg.model
    dims = args.dims
    m.volume.volume_dims = tuple(max(dims >> i, 2) for i in range(5))
    m.sdf_network.packed_trilerp = packed
    m.color_network.packed_bilerp = packed
    m.volume.packed_bilerp = args.agg_packed
    m.volume.agg_remat = args.agg_remat
    m.volume.splat_impl = args.splat_impl
    if args.bf16:
        m.sdf_network.volume_dtype = "bfloat16"
        m.color_network.packed_dtype = "bfloat16"
        m.sdf_network.mlp_dtype = "bfloat16"
        m.color_network.mlp_dtype = "bfloat16"
        # the two that dominate HBM at 256³ (CPU memory analysis: dozens of
        # live f32[256³,8] U-Net/cascade buffers = most of 14.5 GiB temp,
        # the v5e-16GB device fault): raw-volume storage + U-Net activations
        m.volume.dtype = "bfloat16"
        m.reg_network.dtype = "bfloat16"
    cfg.train.epochs = 1000
    cfg.train.warmup = 10

    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0),
                               n_src_views=args.views - 1)
    optimizer = make_optimizer(cfg.train, steps_per_epoch=1)
    opt_state = optimizer.init(params)

    raw = make_scene(n_views=args.views, hw=(args.h, args.w),
                     n_rays=args.rays)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()
              if k not in ("radius", "view_masks")}
    if args.agg_packed == "pallas":
        # per-scale windows sized to THIS rig (host-side, once per scene)
        from gens_tpu.ops.pallas_splat import required_windows_cascade

        if args.splat_window == "auto":
            m.volume.splat_window = required_windows_cascade(
                np.asarray(raw["intrs"]), np.asarray(raw["c2ws"]),
                m.volume.volume_dims, (args.h, args.w))
        else:
            m.volume.splat_window = int(args.splat_window)
        print("splat windows:", m.volume.splat_window, flush=True)

    K = args.iters

    def one_step(carry, i):
        params, opt_state = carry
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)

        def loss_fn(p):
            out = model.forward_train(p, inputs, 1.0, False, key)
            return compute_losses(out, inputs, cfg.train.loss)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), jnp.arange(K))
        return params, opt_state, losses

    t0 = time.time()
    p1, o1, losses = run(params, opt_state)
    jax.block_until_ready(losses)
    compile_s = time.time() - t0

    t0 = time.time()
    p1, o1, losses = run(params, opt_state)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    assert np.isfinite(np.asarray(losses)).all()

    ms = dt / K * 1e3
    return {"packed": packed, "ms_per_step": round(ms, 1),
            "steps_per_s": round(1e3 / ms, 2),
            "train_rays_per_s": round(args.rays * 1e3 / ms, 0),
            "compile_s": round(compile_s, 1), "iters": K,
            "loss_first": float(losses[0]), "loss_last": float(losses[-1])}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--dims", type=int, default=256)
    p.add_argument("--h", type=int, default=480)
    p.add_argument("--w", type=int, default=640)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--agg-packed", nargs="?", const="diff",
                   default=False,
                   choices=[False, "diff", "table", "table_bf16", "pallas"],
                   help="packed bilerp in volume aggregation: bare flag = "
                        "'diff' (raw-map scatter), 'table' = scatter into "
                        "supercell rows + pack-conv transpose")
    p.add_argument("--agg-remat", default="full",
                   choices=["full", "save_gathers", "save_gathers_proj"],
                   help="aggregation remat policy (volume.agg_remat): "
                        "save_gathers keeps gathered values as residuals "
                        "so the backward skips the supercell re-gather")
    p.add_argument("--splat-impl", default="auto",
                   choices=["auto", "kernel", "kernel2", "kernel2f",
                            "adjoint"])
    p.add_argument("--splat-window", default="auto",
                   help="'auto' = per-scale required_windows_cascade of the "
                        "bench rig; or a fixed int for all scales")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--modes", default="packed,raw")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)

    results = {"config": vars(args)}
    for mode in args.modes.split(","):
        r = measure(packed=(mode == "packed"), args=args)
        results[mode] = r
        print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
