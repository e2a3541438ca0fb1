"""Throughput benchmark: rays/s through the full render path on one chip.

The reference publishes no throughput numbers (BASELINE.md); this harness
establishes them. It builds the full-size model (gens.conf dims: 5-view
volume cascade 256³..16³, 128-wide SDF MLP, 64+64 samples with 4 up-sample
rounds), constructs a scene once, then times jit-compiled `render` calls on
fixed-size ray batches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to NOMINAL_BASELINE, the first number this
harness recorded on a v5e chip (there is no reference throughput to compare
against — SURVEY.md §6).
"""

import json
import sys
import time

import numpy as np

# First number recorded by this harness (round 1, TPU v5e, 1024-ray
# batches, host-synced timing): 4978 rays/s.
# Kept fixed so later rounds report speedup against it.
NOMINAL_BASELINE_RAYS_PER_S = 5000.0


def main():
    import jax

    # persistent compilation cache: the render graph is large and the
    # tunneled remote compiler slow; repeated bench runs should hit cache
    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from gens_tpu.config import Config
    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.models.gens import GenSModel

    from gens_tpu.config import apply_inference_fast_paths

    # recommended inference config (packed gathers + bf16 tables/MLP
    # compute — the individual levers and their measured gains are logged
    # in PERF.md; shared with bench_scaling.py so both harnesses time the
    # SAME program)
    cfg = apply_inference_fast_paths(Config())
    n_views = 3  # val-time view count (gens.conf val_dataset num_src_view=2)
    hw = (480, 640)
    n_rays = 1024

    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=n_views - 1)

    raw = make_scene(n_views=n_views, hw=hw, n_rays=n_rays)
    inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}

    # Build the scene (feature extraction + volume cascade + 3D U-Net) once,
    # as validation does per scene.
    build = jax.jit(lambda p, i: model.build_scene(p, i["imgs"], i["intrs"],
                                                   i["c2ws"]))
    # Synchronisation on this tunnel: ``block_until_ready`` returns EARLY
    # (verified r05 — the axon plugin acks before execution drains), so a
    # timing fence must data-depend on the result: index ONE element
    # on-device and pull that scalar. Two historical artifacts of wrong
    # fences here: r04's `np.asarray(leaf)` dragged the entire finest
    # volume (0.5 GB ≈ 700 s through the tunnel) into the warm number,
    # and r05's first fix left the COLD build fenced by block_until_ready
    # only — its real work then drained inside the warm timer ("cold
    # 40.1 s / warm 461.3 s", BENCH log). Both timers now use the scalar
    # fence.
    def sync(scene):
        leaf0 = jax.tree_util.tree_leaves(scene.volumes)[0]
        float(jax.device_get(leaf0[(0,) * leaf0.ndim]))

    t0 = time.time()
    scene = build(params, inputs)
    sync(scene)
    build_time = time.time() - t0  # compile (cached across runs) + build
    # second build = the per-scene work validation actually pays per scan
    t0 = time.time()
    scene = build(params, inputs)
    sync(scene)
    build_warm_time = time.time() - t0

    iters = 20

    # Device-side timing loop: the tunneled device adds multi-second host
    # dispatch stalls, so the iteration loop runs INSIDE one jit. The PRNG
    # key is folded per iteration so XLA cannot hoist the (otherwise
    # loop-invariant) render out of the loop.
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

    t0 = time.time()
    acc = float(np.asarray(render_n(*args)))
    compile_time = time.time() - t0
    assert np.isfinite(acc)

    t0 = time.time()
    acc = float(np.asarray(render_n(*args)))  # includes one host roundtrip
    dt = time.time() - t0

    rays_per_s = n_rays * iters / dt
    result = {
        "metric": "render_rays_per_s_per_chip",
        "value": round(float(rays_per_s), 1),
        "unit": "rays/s",
        "vs_baseline": round(float(rays_per_s / NOMINAL_BASELINE_RAYS_PER_S), 3),
    }
    print(json.dumps(result))
    print(f"# scene build {build_time:.1f}s (warm {build_warm_time:.1f}s), "
          f"render compile {compile_time:.1f}s, "
          f"steady-state {dt / iters * 1e3:.1f} ms / {n_rays} rays",
          file=sys.stderr)


if __name__ == "__main__":
    main()
