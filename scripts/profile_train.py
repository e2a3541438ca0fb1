"""Train-step profiling: XLA memory analysis + optional jax.profiler trace.

Two outputs:
  1. ``compiled.memory_analysis()`` of the FULL jitted train step (value_and_
     grad + optimizer update) — argument/output/temp/generated-code bytes as
     the compiler sees them. On TPU these are the real HBM numbers behind the
     256^3-scale device fault (v5e = 16 GB); on CPU they still rank the
     dominant buffers structurally.
  2. ``--trace DIR``: a jax.profiler trace of K steps for op-level timing
     (open with tensorboard or xprof).

Usage:
    python scripts/profile_train.py --dims 192            # TPU, analysis only
    python scripts/profile_train.py --cpu --dims 256      # CPU structural
    python scripts/profile_train.py --trace /tmp/tr --iters 3
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--dims", type=int, default=192)
    p.add_argument("--h", type=int, default=480)
    p.add_argument("--w", type=int, default=640)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--agg-packed", nargs="?", const="diff",
                   default=False, choices=[False, "diff", "table"],
                   help="packed bilerp in volume aggregation: bare flag = "
                        "'diff' (raw-map scatter), 'table' = scatter into "
                        "supercell rows + pack-conv transpose")
    p.add_argument("--raw", action="store_true",
                   help="disable the packed-diff training lookups")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--trace", default=None,
                   help="directory for a jax.profiler trace (runs 3 steps)")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    import jax.numpy as jnp
    import optax

    from gens_tpu.config import Config
    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.losses import compute_losses
    from gens_tpu.models.gens import GenSModel
    from gens_tpu.train.step import init_train_state, make_optimizer

    cfg = Config()
    m = cfg.model
    m.volume.volume_dims = tuple(max(args.dims >> i, 2) for i in range(5))
    m.sdf_network.packed_trilerp = not args.raw
    m.color_network.packed_bilerp = not args.raw
    m.volume.packed_bilerp = args.agg_packed
    if args.bf16:
        m.sdf_network.volume_dtype = "bfloat16"
        m.color_network.packed_dtype = "bfloat16"
        m.volume.dtype = "bfloat16"
        m.reg_network.dtype = "bfloat16"

    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0),
                               n_src_views=args.views - 1)
    optimizer = make_optimizer(cfg.train, steps_per_epoch=1)
    opt_state = optimizer.init(params)

    raw = make_scene(n_views=args.views, hw=(args.h, args.w),
                     n_rays=args.rays)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()
              if k not in ("radius", "view_masks")}

    def train_step(params, opt_state, inputs, key):
        def loss_fn(p):
            out = model.forward_train(p, inputs, 1.0, False, key)
            return compute_losses(out, inputs, cfg.train.loss)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    print(f"lowering train step at dims={args.dims} "
          f"views={args.views} {args.h}x{args.w} rays={args.rays} "
          f"packed={not args.raw} bf16={args.bf16} "
          f"backend={jax.default_backend()}", flush=True)
    t0 = time.time()
    lowered = jax.jit(train_step).lower(params, opt_state, inputs, key)
    compiled = lowered.compile()
    print(f"compile {time.time() - t0:.1f}s", flush=True)

    ma = compiled.memory_analysis()
    if ma is not None:
        fields = [f for f in dir(ma) if f.endswith("_size_in_bytes")]
        stats = {f: getattr(ma, f) / 2**30 for f in fields}
        print(json.dumps({k: round(v, 3) for k, v in stats.items()},
                         indent=1))
        total = (getattr(ma, "argument_size_in_bytes", 0)
                 + getattr(ma, "output_size_in_bytes", 0)
                 + getattr(ma, "temp_size_in_bytes", 0))
        print(f"peak-ish total (args+out+temp): {total / 2**30:.2f} GiB",
              flush=True)
    else:
        print("memory_analysis unavailable on this backend", flush=True)

    if args.trace:
        p1, o1, loss = compiled(params, opt_state, inputs, key)
        jax.block_until_ready(loss)
        with jax.profiler.trace(args.trace):
            for i in range(args.iters):
                p1, o1, loss = compiled(p1, o1, inputs,
                                        jax.random.fold_in(key, i))
            jax.block_until_ready(loss)
        print(f"trace written to {args.trace}", flush=True)
    else:
        t0 = time.time()
        p1, o1, loss = compiled(params, opt_state, inputs, key)
        jax.block_until_ready(loss)
        print(f"step 1 (incl. any residual compile): {time.time()-t0:.2f}s "
              f"loss={float(loss):.4f}", flush=True)


if __name__ == "__main__":
    main()
