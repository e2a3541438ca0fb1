"""Render-throughput A/B harness: bench.py's exact methodology, but over a
named set of config variants (for attributing regressions/gains to single
flags). Prints one JSON line per variant."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(name, mutate, n_views=3, hw=(480, 640), n_rays=1024,
                iters=20):
    import jax
    import jax.numpy as jnp

    from gens_tpu.config import Config, apply_inference_fast_paths
    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.models.gens import GenSModel

    cfg = apply_inference_fast_paths(Config())
    mutate(cfg)
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=n_views - 1)
    raw = make_scene(n_views=n_views, hw=hw, n_rays=n_rays)
    inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}

    build = jax.jit(lambda p, i: model.build_scene(p, i["imgs"], i["intrs"],
                                                   i["c2ws"]))
    scene = build(params, inputs)
    jax.block_until_ready(jax.tree_util.tree_leaves(scene.volumes))

    @jax.jit
    def render_n(params, scene, rays_o, rays_d, near, far):
        def body(i, acc):
            out = model.renderer.render(
                params, rays_o, rays_d, near, far, scene,
                cos_anneal_ratio=1.0, use_match_features=False,
                key=jax.random.fold_in(jax.random.PRNGKey(0), i),
                train=False)
            return acc + jnp.sum(out["color_fine"])
        return jax.lax.fori_loop(0, iters, body, 0.0)

    args = (params, scene, inputs["rays_o"], inputs["rays_d"],
            inputs["near"], inputs["far"])
    acc = float(np.asarray(render_n(*args)))
    t0 = time.time()
    acc = float(np.asarray(render_n(*args)))
    dt = time.time() - t0
    assert np.isfinite(acc)
    r = {"variant": name, "rays_per_s": round(n_rays * iters / dt, 1),
         "ms_per_1024": round(dt / iters * 1e3, 1)}
    print(json.dumps(r), flush=True)
    return r


# NB flags are set EXPLICITLY (apply_inference_fast_paths no longer enables
# the fused merges after the round-3 negative result, so "unset-only"
# lambdas would all be identical no-ops)
VARIANTS = {
    "baseline_r02": lambda c: (
        setattr(c.model.sdf_network, "fused_packed", False),
        setattr(c.model.color_network, "fused_pyramid", False)),
    "fused_cascade_only": lambda c: (
        setattr(c.model.sdf_network, "fused_packed", True),
        setattr(c.model.color_network, "fused_pyramid", False)),
    "fused_pyramid_only": lambda c: (
        setattr(c.model.sdf_network, "fused_packed", False),
        setattr(c.model.color_network, "fused_pyramid", True)),
    "fused_both": lambda c: (
        setattr(c.model.sdf_network, "fused_packed", True),
        setattr(c.model.color_network, "fused_pyramid", True)),
    # round-4: fused single-gather ONLY for the hierarchical-sampling
    # probes (tiny populations, gather-ramp-up regime); render_core keeps
    # per-scale gathers (where fused measured slower in round 3)
    "fused_sampling_only": lambda c: (
        setattr(c.model.sdf_network, "fused_packed", True),
        setattr(c.model.sdf_network, "fused_sampling_only", True),
        setattr(c.model.color_network, "fused_pyramid", False)),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default=",".join(VARIANTS))
    p.add_argument("--rays-sweep", default="",
                   help="comma list of ray-chunk sizes; sweeps the baseline "
                        "variant over chunk size instead of the variant set "
                        "(GATHER_PROBE: populations below ~256k rows pay a "
                        "2-6x gather ramp-up, so bigger val chunks should "
                        "amortize it)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    results = []
    if args.rays_sweep:
        for n in (int(s) for s in args.rays_sweep.split(",")):
            # fewer fori iterations at big chunks keeps run time flat
            iters = max(4, min(20, (20 * 1024) // n))
            results.append(run_variant(f"rays_{n}", VARIANTS["baseline_r02"],
                                       n_rays=n, iters=iters))
    else:
        for name in args.variants.split(","):
            results.append(run_variant(name, VARIANTS[name]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
