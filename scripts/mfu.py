"""MFU / roofline accounting per pipeline stage (round-3 item: BASELINE.md's
perf target is "speed-of-light for the render core", and until now the repo
had no FLOP or bytes-moved accounting to judge any throughput number
against).

For every stage of the train step (feature net, volume aggregation, 3D
U-Net, renderer fwd+bwd) and for the inference render path this script
reports:

* ``ms``             — measured wall time (honest lax.scan-of-K methodology,
                       PERF.md: per-iteration input jitter, timed on the 2nd
                       call, host transfer of the accumulated scalar)
* ``gflops``         — XLA's own cost model of the compiled single-call
                       executable (``compiled.cost_analysis()``), which
                       counts the fused HLO actually executed
* ``gbytes``         — XLA "bytes accessed" (HBM traffic estimate incl.
                       gather/scatter operands)
* ``tflops_s``       — achieved compute rate
* ``gbps``           — achieved memory rate
* ``mfu_pct``        — tflops_s / peak MXU (device-kind table below)
* ``hbm_pct``        — gbps / peak HBM bandwidth
* ``sol_ms``         — roofline speed-of-light: max(flop time, byte time)
* ``slowdown``       — ms / sol_ms (1.0 = on the roof; addressing-bound
                       gathers land far above 1 at low hbm_pct — the TPU
                       gather engine issues one row per cycle regardless of
                       row width, so narrow rows waste the HBM interface;
                       see PERF.md "the gather problem")

The reference has no counterpart (no profiling at all, SURVEY §5); the duty
being accounted is its hot loop /root/reference/models/modules/
implicit_surface.py:152-349 + volume.py:13-63 + reg_network.py:140-166.

Usage:
    python scripts/mfu.py [--dims 256] [--bf16] [--agg-packed table]
        [--out MFU_r03.json]          # TPU ambient; --cpu for structure
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# peak rates per chip by device kind: (MXU bf16 FLOP/s, HBM bytes/s).
# v5e: 197 bf16 TFLOP/s, 819 GB/s HBM (public spec sheet numbers; f32
# matmuls run below the bf16 peak — MFU here is vs the bf16 roof, the
# number "speed-of-light" claims must be judged against).
PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5": (459e12, 1228e9),      # v5p
    "TPU v4": (275e12, 1228e9),
    "cpu": (1e12, 100e9),            # structural runs only
}


def device_peaks():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in PEAKS.items():
        if kind.startswith(k):
            return kind, v
    return kind, PEAKS["TPU v5 lite"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--dims", type=int, default=256)
    p.add_argument("--h", type=int, default=480)
    p.add_argument("--w", type=int, default=640)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--bench-rays", type=int, default=1024,
                   help="ray count of the inference render stage (bench.py)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--agg-packed", nargs="?", const="diff",
                   default="table",
                   choices=[False, "diff", "table", "table_bf16", "pallas"])
    p.add_argument("--agg-remat", default="full",
                   choices=["full", "save_gathers", "save_gathers_proj"],
                   help="aggregation remat policy (volume.agg_remat): "
                        "save_gathers keeps gathered values as residuals "
                        "so the backward skips the supercell re-gather")
    p.add_argument("--splat-impl", default="auto",
                   choices=["auto", "kernel", "kernel2", "kernel2f",
                            "adjoint"],
                   help="splat backward/forward implementation for "
                        "--agg-packed pallas (kernel2/kernel2f = the r05 "
                        "tuned variants, scripts/agg_bwd_split.py)")
    p.add_argument("--splat-window", default="auto",
                   help="'auto' = per-scale required_windows_cascade of the "
                        "bench rig; or a fixed int for all scales")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--stages",
                   default="feature,agg,unet,render,render_infer,train_step")
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

    kind, (peak_flops, peak_bw) = device_peaks()
    print(f"device: {kind}  peaks: {peak_flops/1e12:.0f} TFLOP/s "
          f"{peak_bw/1e9:.0f} GB/s", flush=True)

    cfg = Config()
    m = cfg.model
    m.volume.volume_dims = tuple(max(args.dims >> i, 2) for i in range(5))
    m.volume.packed_bilerp = args.agg_packed
    m.volume.agg_remat = args.agg_remat
    m.volume.splat_impl = args.splat_impl
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
    if args.agg_packed == "pallas":
        from gens_tpu.ops.pallas_splat import required_windows_cascade

        if args.splat_window == "auto":
            m.volume.splat_window = required_windows_cascade(
                np.asarray(raw["intrs"]), np.asarray(raw["c2ws"]),
                m.volume.volume_dims, (args.h, args.w))
        else:
            m.volume.splat_window = int(args.splat_window)
        print("splat windows:", m.volume.splat_window, flush=True)
    K = args.iters
    results = {"config": vars(args), "device": kind,
               "peak_tflops": peak_flops / 1e12,
               "peak_gbps": peak_bw / 1e9, "stages": {}}
    if args.out and os.path.exists(args.out):
        # merge-in-place: a --stages subset re-measure (e.g. agg/train_step
        # under a different remat policy — the only stages remat affects)
        # must not drop the other stages' recorded rows
        with open(args.out) as f:
            prev = json.load(f)
        results["stages"].update(prev.get("stages", {}))
        for k, v in prev.items():
            if k not in ("config", "stages") and k not in results:
                results[k] = v

    def jit_img(i, x):
        return x * (1.0 + 1e-6 * i)

    def measure(name, fn, init):
        """fn(i, *init) -> f32 scalar. Times K scanned iterations AND cost-
        analyzes the compiled single-call executable. One retry per stage on
        transient tunnel/remote-compile failures, then an error row — a
        flake must not lose the whole artifact (r05: a mid-run 'response
        body closed' killed MFU before its single end-of-run write; rows
        are now also flushed to --out after every stage)."""
        try:
            return _measure(name, fn, init)
        except jax.errors.JaxRuntimeError as e:
            print(f"  {name}: transient backend error, retrying once: "
                  f"{str(e)[:200]}", flush=True)
            time.sleep(10.0)
            try:
                return _measure(name, fn, init)
            except jax.errors.JaxRuntimeError as e2:
                results["stages"][name] = {"error": str(e2)[:400]}
                _flush()
                return None

    def _flush():
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)

    def _measure(name, fn, init):
        single = jax.jit(fn).lower(jnp.int32(0), *init).compile()
        try:
            ca = single.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", float("nan")))
            gbytes = float(ca.get("bytes accessed", float("nan")))
        except Exception as e:  # plugin without cost analysis
            print(f"  cost_analysis unavailable ({e})", flush=True)
            flops = gbytes = float("nan")

        # big arrays as jit ARGUMENTS — closure constants get baked into the
        # HLO and the remote compiler rejects large programs (PERF.md)
        @jax.jit
        def run(salt, *a):
            def body(acc, i):
                return acc + fn(i, *a), None
            acc, _ = jax.lax.scan(body, salt, jnp.arange(K))
            return acc

        t0 = time.time()
        a0 = float(run(jnp.float32(0.125), *init))
        compile_s = time.time() - t0
        t0 = time.time()
        a1 = float(run(jnp.float32(0.25), *init))
        ms = (time.time() - t0) / K * 1e3
        assert np.isfinite(a0) and np.isfinite(a1), name

        sec = ms / 1e3
        tflops_s = flops / sec / 1e12
        gbps = gbytes / sec / 1e9
        sol_s = max(flops / peak_flops, gbytes / peak_bw)
        row = {
            "ms": round(ms, 2),
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(gbytes / 1e9, 3),
            "tflops_s": round(tflops_s, 2),
            "gbps": round(gbps, 1),
            "mfu_pct": round(100 * tflops_s * 1e12 / peak_flops, 2),
            "hbm_pct": round(100 * gbps * 1e9 / peak_bw, 2),
            "sol_ms": round(sol_s * 1e3, 2),
            "slowdown_vs_sol": round(ms / (sol_s * 1e3), 1)
            if sol_s > 0 else None,
            "compile_s": round(compile_s, 1),
            # per-row provenance: merge-in-place (--out onto an existing
            # file) would otherwise leave rows measured under a DIFFERENT
            # policy stamped with the latest run's top-level config
            # (ADVICE r04: MFU_r04.json's full-remat rows became
            # unreproducible after an agg,train_step re-measure)
            "measured_at": {
                "agg_packed": m.volume.packed_bilerp,
                "agg_remat": m.volume.agg_remat,
                "splat_impl": m.volume.splat_impl,
                "bf16": bool(args.bf16),
                "dims": args.dims,
                "views": args.views,
                "rays": args.rays,
            },
        }
        results["stages"][name] = row
        _flush()
        print(f"{name:22s} {ms:9.1f} ms  {row['gflops']:10.1f} GF "
              f"{row['gbytes']:8.2f} GB  mfu {row['mfu_pct']:5.2f}%  "
              f"hbm {row['hbm_pct']:5.1f}%  sol {row['sol_ms']:8.2f} ms "
              f"({row['slowdown_vs_sol']}x)", flush=True)
        return row

    stages = args.stages.split(",")

    if "feature" in stages:
        def feat_fwd(i, p, imgs):
            f = model.feature_net.apply(p["feature"], jit_img(i, imgs))
            return sum(jnp.sum(x) for x in f).astype(jnp.float32)

        def feat_bwd(i, p, imgs):
            def loss(pf):
                f = model.feature_net.apply(pf, jit_img(i, imgs))
                return sum(jnp.sum(x ** 2) for x in f)
            g = jax.grad(loss)(p["feature"])
            return sum(jnp.sum(x) for x in
                       jax.tree_util.tree_leaves(g)).astype(jnp.float32)

        measure("feature_fwd", feat_fwd, (params, inputs["imgs"]))
        measure("feature_fwdbwd", feat_bwd, (params, inputs["imgs"]))

    features = jax.jit(lambda p, im: model.extract_features(p, im))(
        params, inputs["imgs"])
    features = jax.tree_util.tree_map(jax.lax.stop_gradient, features)

    if "agg" in stages:
        def agg_fwd(i, feats, intrs, c2ws):
            feats = [jit_img(i, f) for f in feats]
            vols, _ = agg_mean_var(feats, intrs, c2ws, m.volume.volume_dims,
                                   packed_bilerp=m.volume.packed_bilerp,
                                   splat_window=m.volume.splat_window,
                                   agg_remat=m.volume.agg_remat)
            return sum(jnp.sum(v).astype(jnp.float32) for v in vols)

        def agg_bwd(i, feats, intrs, c2ws):
            def loss(fs_in):
                fs = [jit_img(i, f) for f in fs_in]
                vols, _ = agg_mean_var(fs, intrs, c2ws, m.volume.volume_dims,
                                       packed_bilerp=m.volume.packed_bilerp,
                                       splat_window=m.volume.splat_window,
                                       agg_remat=m.volume.agg_remat)
                return sum(jnp.sum(v ** 2).astype(jnp.float32) for v in vols)
            g = jax.grad(loss)(list(feats))
            return sum(jnp.sum(x) for x in g).astype(jnp.float32)

        a = (list(features), inputs["intrs"], inputs["c2ws"])
        measure("agg_fwd", agg_fwd, a)
        measure("agg_fwdbwd", agg_bwd, a)

        # analytic gather-traffic floor for the aggregation forward: one
        # packed 9C-row (+4B index) per (voxel, view) per scale + the
        # volume write — what the gathers MUST move even at perfect
        # addressing. Compare with the measured rate.
        C = m.feature_network.d_out[0]
        elem = 2 if args.bf16 else 4
        g_bytes = sum(
            d ** 3 * args.views * (9 * C * elem + 4)      # gather rows + idx
            + d ** 3 * 2 * C * elem                        # volume write
            for d in m.volume.volume_dims)
        results["agg_gather_floor_gb"] = round(g_bytes / 1e9, 3)

    if "unet" in stages:
        raw_vols, _ = jax.jit(lambda f, i, c: agg_mean_var(
            list(f), i, c, m.volume.volume_dims))(
                features, inputs["intrs"], inputs["c2ws"])
        raw_vols = [jax.lax.stop_gradient(v) for v in raw_vols]

        def unet_fwd(i, p, vols):
            vols = [jit_img(i, v) for v in vols]
            out = model.reg_net.apply(p["reg"], [v[None] for v in vols])
            return sum(jnp.sum(v).astype(jnp.float32) for v in out)

        def unet_bwd(i, p, vols):
            def loss(pr):
                vs = [jit_img(i, v) for v in vols]
                out = model.reg_net.apply(pr, [v[None] for v in vs])
                return sum(jnp.sum(v ** 2).astype(jnp.float32) for v in out)
            g = jax.grad(loss)(p["reg"])
            return sum(jnp.sum(x) for x in
                       jax.tree_util.tree_leaves(g)).astype(jnp.float32)

        measure("unet_fwd", unet_fwd, (params, list(raw_vols)))
        measure("unet_fwdbwd", unet_bwd, (params, list(raw_vols)))

    if "render" in stages or "render_infer" in stages:
        scene = jax.jit(lambda p, i: model.build_scene(
            p, i["imgs"], i["intrs"], i["c2ws"]))(params, inputs)
        scene = jax.tree_util.tree_map(jax.lax.stop_gradient, scene)

    if "render" in stages:
        def render_bwd(i, p, sc, inp):
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

        measure("render_fwdbwd", render_bwd, (params, scene, inputs))

    if "render_infer" in stages:
        # EXACTLY the bench.py configuration (shared helper — packed
        # gathers, bf16 tables AND bf16 MLP compute), so this row's sol is
        # the one consistent speed-of-light for the headline render number
        # (VERDICT r03 weak #5: the r03 render sol came from a different
        # config than bench.py's)
        from gens_tpu.config import apply_inference_fast_paths

        icfg = apply_inference_fast_paths(Config())
        im = icfg.model
        im.volume.volume_dims = m.volume.volume_dims
        imodel = GenSModel(icfg.model)
        # bench.py renders a 3-VIEW scene (val-time view count) — the
        # source-view-proportional stages (blending, feature lookup, MFC
        # warps) scale with it, so the sol must be accounted at 3 views,
        # not this script's 5-view training scene (the r03 artifact's
        # residual inconsistency: its 5-view row implied 16.9k rays/s
        # against bench.py's measured 30.3k)
        iraw = make_scene(n_views=3, hw=(args.h, args.w),
                          n_rays=args.bench_rays)
        iinputs = {k: jnp.asarray(v) for k, v in iraw.items()
                   if k != "radius"}
        iparams = imodel.init_params(jax.random.PRNGKey(0), n_src_views=2)
        iscene = jax.jit(lambda p, i: imodel.build_scene(
            p, i["imgs"], i["intrs"], i["c2ws"]))(iparams, iinputs)
        iscene = jax.tree_util.tree_map(jax.lax.stop_gradient, iscene)
        ro, rd = iinputs["rays_o"], iinputs["rays_d"]
        R = args.bench_rays

        def render_fwd(i, p, sc):
            out = imodel.renderer.render(
                p, ro * (1.0 + 1e-6 * i), rd, iinputs["near"],
                iinputs["far"], sc, cos_anneal_ratio=1.0,
                use_match_features=False,
                key=jax.random.PRNGKey(0), train=False)
            return jnp.sum(out["color_fine"]).astype(jnp.float32)

        row = measure("render_infer_fwd", render_fwd, (iparams, iscene))
        if row:
            results["render_infer_rays_s"] = round(R / (row["ms"] / 1e3), 0)
            results["render_infer_sol_rays_s"] = round(
                R / (row["sol_ms"] / 1e3), 0)

    if "train_step" in stages:
        from gens_tpu.train.step import make_optimizer

        cfg.train.epochs = 1000
        cfg.train.warmup = 10
        optimizer = make_optimizer(cfg.train, steps_per_epoch=1)
        opt_state = optimizer.init(params)

        def step_fn(i, p, o):
            import optax

            key = jax.random.fold_in(jax.random.PRNGKey(0), i)

            def loss_fn(pp):
                out = model.forward_train(pp, inputs, 1.0, False, key)
                return compute_losses(out, inputs, cfg.train.loss)["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, _ = optimizer.update(grads, o, p)
            newp = optax.apply_updates(p, updates)
            return loss + 0.0 * sum(
                jnp.sum(x) for x in jax.tree_util.tree_leaves(newp))

        row = measure("train_step", step_fn, (params, opt_state))
        if row:
            results["train_sol_steps_s"] = round(1e3 / row["sol_ms"], 2)

    print(json.dumps({k: v for k, v in results.items() if k != "config"},
                     indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
