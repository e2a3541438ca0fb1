"""Stage-level train-step cost attribution (honest fori_loop methodology,
PERF.md): times each pipeline stage's forward AND forward+backward
separately — feature extraction, volume aggregation, 3D U-Net, renderer —
so optimization effort goes where the milliseconds are.

Each stage runs K times inside ONE jit with a per-iteration input jitter
(fold_in / iota-derived) so XLA cannot hoist the body; timed on the second
call (compile excluded).

Usage (TPU ambient; --cpu for structural runs):
    python scripts/profile_stages.py --dims 128 [--agg-packed] [--bf16]
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
    p.add_argument("--dims", type=int, default=128)
    p.add_argument("--h", type=int, default=480)
    p.add_argument("--w", type=int, default=640)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--agg-packed", nargs="?", const="diff",
                   default=False, choices=[False, "diff", "table"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--stages", default="feature,agg,unet,render")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    import jax.numpy as jnp

    from gens_tpu.config import Config
    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.losses import compute_losses
    from gens_tpu.models.gens import GenSModel
    from gens_tpu.models.volume import agg_mean_var

    cfg = Config()
    m = cfg.model
    m.volume.volume_dims = tuple(max(args.dims >> i, 2) for i in range(5))
    m.volume.packed_bilerp = args.agg_packed
    m.sdf_network.packed_trilerp = True
    m.color_network.packed_bilerp = True
    if args.bf16:
        m.volume.dtype = "bfloat16"
        m.reg_network.dtype = "bfloat16"
        m.sdf_network.volume_dtype = "bfloat16"
        m.color_network.packed_dtype = "bfloat16"

    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0),
                               n_src_views=args.views - 1)
    raw = make_scene(n_views=args.views, hw=(args.h, args.w),
                     n_rays=args.rays)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()
              if k not in ("radius", "view_masks")}
    K = args.iters

    def timed(name, make_fn, *fn_args):
        """make_fn(*fn_args) -> (loop_fn, init_args). loop_fn is scanned K
        times with an iteration index for jitter."""
        loop_fn, init = make_fn(*fn_args)

        @jax.jit
        def run(salt, *a):
            def body(acc, i):
                return acc + loop_fn(i, *a), None
            acc, _ = jax.lax.scan(body, salt, jnp.arange(K))
            return acc

        # time around an actual host transfer of the accumulated scalar —
        # through the tunnel block_until_ready alone returns without waiting
        # (measured: 0.2 ms for a 480p 5-view FPN pass), float() does not.
        # The per-call salt defeats any (program, args) result memoization.
        t0 = time.time()
        a0 = float(run(jnp.float32(0.125), *init))
        compile_s = time.time() - t0
        t0 = time.time()
        a1 = float(run(jnp.float32(0.25), *init))
        ms = (time.time() - t0) / K * 1e3
        assert np.isfinite(a0) and np.isfinite(a1)
        print(f"{name:24s} {ms:9.1f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    results = {"config": vars(args)}
    stages = args.stages.split(",")

    # per-iteration jitter: scale inputs by (1 + eps*i) so nothing hoists
    def jit_img(i, x):
        return x * (1.0 + 1e-6 * i)

    if "feature" in stages:
        def feat_fwd():
            def fn(i, p, imgs):
                f = model.feature_net.apply(p["feature"], jit_img(i, imgs))
                return sum(jnp.sum(x) for x in f).astype(jnp.float32)
            return fn, (params, inputs["imgs"])

        def feat_bwd():
            def fn(i, p, imgs):
                def loss(pf):
                    f = model.feature_net.apply(pf, jit_img(i, imgs))
                    return sum(jnp.sum(x ** 2) for x in f)
                return jax.grad(loss)(p["feature"])[
                    "params"]["enc0_conv0"]["kernel"].sum().astype(jnp.float32)
            return fn, (params, inputs["imgs"])

        results["feature_fwd_ms"] = timed("feature fwd", feat_fwd)
        try:
            results["feature_fwdbwd_ms"] = timed("feature fwd+bwd", feat_bwd)
        except KeyError:
            # parameter path name differs (e.g. mnasnet backbone): fall back
            # to a full-pytree-sum cotangent
            def feat_bwd2():
                def fn(i, p, imgs):
                    def loss(pf):
                        f = model.feature_net.apply(pf, jit_img(i, imgs))
                        return sum(jnp.sum(x ** 2) for x in f)
                    g = jax.grad(loss)(p["feature"])
                    return sum(jnp.sum(x) for x in
                               jax.tree_util.tree_leaves(g)).astype(
                                   jnp.float32)
                return fn, (params, inputs["imgs"])
            results["feature_fwdbwd_ms"] = timed("feature fwd+bwd",
                                                 feat_bwd2)

    features = jax.jit(lambda p, im: model.extract_features(p, im))(
        params, inputs["imgs"])
    features = jax.tree_util.tree_map(jax.lax.stop_gradient, features)

    if "agg" in stages:
        def agg_fwd():
            def fn(i, feats, intrs, c2ws):
                feats = [jit_img(i, f) for f in feats]
                vols, _ = agg_mean_var(
                    feats, intrs, c2ws, m.volume.volume_dims,
                    packed_bilerp=m.volume.packed_bilerp)
                return sum(jnp.sum(v).astype(jnp.float32) for v in vols)
            return fn, (list(features), inputs["intrs"], inputs["c2ws"])

        def agg_bwd():
            def fn(i, feats, intrs, c2ws):
                def loss(fs_in):
                    fs = [jit_img(i, f) for f in fs_in]
                    vols, _ = agg_mean_var(
                        fs, intrs, c2ws, m.volume.volume_dims,
                        packed_bilerp=m.volume.packed_bilerp)
                    return sum(jnp.sum(v ** 2).astype(jnp.float32)
                               for v in vols)
                g = jax.grad(loss)(list(feats))
                return sum(jnp.sum(x) for x in g).astype(jnp.float32)
            return fn, (list(features), inputs["intrs"], inputs["c2ws"])

        results["agg_fwd_ms"] = timed("agg fwd", agg_fwd)
        results["agg_fwdbwd_ms"] = timed("agg fwd+bwd", agg_bwd)

    if "unet" in stages:
        raw_vols, _ = jax.jit(lambda f, i, c: agg_mean_var(
            list(f), i, c, m.volume.volume_dims))(
                features, inputs["intrs"], inputs["c2ws"])
        raw_vols = [jax.lax.stop_gradient(v) for v in raw_vols]

        def unet_fwd():
            def fn(i, p, vols):
                vols = [jit_img(i, v) for v in vols]
                out = model.reg_net.apply(p["reg"], [v[None] for v in vols])
                return sum(jnp.sum(v).astype(jnp.float32) for v in out)
            return fn, (params, list(raw_vols))

        def unet_bwd():
            def fn(i, p, vols):
                def loss(pr):
                    vs = [jit_img(i, v) for v in vols]
                    out = model.reg_net.apply(pr, [v[None] for v in vs])
                    return sum(jnp.sum(v ** 2).astype(jnp.float32)
                               for v in out)
                g = jax.grad(loss)(p["reg"])
                return sum(jnp.sum(x) for x in
                           jax.tree_util.tree_leaves(g)).astype(jnp.float32)
            return fn, (params, list(raw_vols))

        results["unet_fwd_ms"] = timed("unet fwd", unet_fwd)
        results["unet_fwdbwd_ms"] = timed("unet fwd+bwd", unet_bwd)

    if "render" in stages:
        scene = jax.jit(lambda p, i: model.build_scene(
            p, i["imgs"], i["intrs"], i["c2ws"]))(params, inputs)
        scene = jax.tree_util.tree_map(jax.lax.stop_gradient, scene)

        def render_bwd():
            def fn(i, p, sc, inp):
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)

                def loss(pp):
                    out = model.renderer.render(
                        pp, inp["rays_o"], inp["rays_d"], inp["near"],
                        inp["far"], sc, cos_anneal_ratio=1.0,
                        use_match_features=False, key=key, train=True)
                    return compute_losses(out, inp, cfg.train.loss)["loss"]

                mlp = {k: p[k] for k in ("sdf", "blending", "variance")}
                g = jax.grad(loss)(mlp)
                return sum(jnp.sum(x) for x in
                           jax.tree_util.tree_leaves(g)).astype(jnp.float32)
            return fn, (params, scene, inputs)

        results["render_fwdbwd_ms"] = timed("render fwd+bwd", render_bwd)

    print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in results.items() if k != "config"},
                     indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
