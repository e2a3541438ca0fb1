"""Multi-device scaling-efficiency harness for the render path.

The BASELINE.md north star asks for rays/s measured at 1 chip, 1 host and
N hosts with >= 80% scaling efficiency. On a real slice this script measures
it directly; without TPU hardware it runs the identical harness on a virtual
CPU mesh (JAX fake backend) to validate the methodology and the sharded
program (numbers are then about correctness, not speed).

Methodology: rays are sharded over all devices (pure data-parallel render —
each device holds a replica of the scene and renders its ray shard);
efficiency(N) = rays_per_s(N) / (N * rays_per_s(1)).

Usage:
    python scripts/bench_scaling.py                  # real backend
    python scripts/bench_scaling.py --cpu --devices 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(n_devices: int, rays_per_device: int = 1024, iters: int = 10,
            plain_jit: bool = False):
    """rays/s with rays sharded over ``n_devices`` via shard_map.

    ``plain_jit=True`` times the identical program through a single-device
    ``jax.jit`` instead — the bench.py path — so the shard_map overhead at
    n=1 is measurable apples-to-apples (round-2 verdict: two render numbers
    existed with no reconciliation; the gap was bench_scaling not enabling
    the packed/bf16 fast paths, fixed by sharing apply_inference_fast_paths).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from gens_tpu.config import Config, apply_inference_fast_paths
    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.models.gens import GenSModel

    cfg = apply_inference_fast_paths(Config())
    if jax.default_backend() == "cpu":
        # keep the CPU harness tractable
        cfg.model.volume.volume_dims = (64, 32, 16, 8, 4)
        cfg.model.render.n_samples = 32
        cfg.model.render.n_importance = 32

    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    n_rays = rays_per_device * n_devices
    raw = make_scene(n_views=3, hw=(480, 640) if jax.default_backend() != "cpu"
                     else (128, 128), n_rays=n_rays)
    inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}

    scene = jax.jit(lambda p, i: model.build_scene(
        p, i["imgs"], i["intrs"], i["c2ws"]))(params, inputs)
    jax.block_until_ready(scene.volumes)

    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("rays",))

    def device_render(params, scene, ro, rd, near, far):
        def body(i, acc):
            out = model.renderer.render(
                params, ro, rd, near, far, scene,
                cos_anneal_ratio=1.0, use_match_features=False,
                key=jax.random.fold_in(jax.random.PRNGKey(0), i), train=False)
            return acc + jnp.sum(out["color_fine"])
        # the carry becomes varying over the rays axis inside the body;
        # mark the init accordingly (JAX>=0.9 checks manual-axis vma)
        acc0 = jax.lax.pcast(jnp.float32(0.0), ("rays",), to="varying")
        acc = jax.lax.fori_loop(0, iters, body, acc0)
        return jax.lax.psum(acc, "rays")

    if plain_jit:
        assert n_devices == 1

        def plain_render(params, scene, ro, rd, near, far):
            def body(i, acc):
                out = model.renderer.render(
                    params, ro, rd, near, far, scene,
                    cos_anneal_ratio=1.0, use_match_features=False,
                    key=jax.random.fold_in(jax.random.PRNGKey(0), i),
                    train=False)
                return acc + jnp.sum(out["color_fine"])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        sharded = jax.jit(plain_render)
    else:
        sharded = jax.jit(shard_map(
            device_render, mesh=mesh,
            in_specs=(P(), P(), P("rays"), P("rays"), P(), P()),
            out_specs=P(),
        ))

    args = (params, scene, inputs["rays_o"], inputs["rays_d"],
            inputs["near"], inputs["far"])
    acc = float(np.asarray(sharded(*args)))  # compile + warm
    t0 = time.time()
    acc = float(np.asarray(sharded(*args)))
    dt = time.time() - t0
    assert np.isfinite(acc)
    return n_rays * iters / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--rays_per_device", type=int, default=1024)
    p.add_argument("--compare-plain", action="store_true",
                   help="also time the n=1 config through a plain jit "
                        "(the bench.py path) to isolate shard_map overhead")
    args = p.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count="
                                   + str(args.devices or 8)).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    total = args.devices or len(jax.devices())
    results = {}
    if args.compare_plain:
        rate = measure(1, args.rays_per_device, plain_jit=True)
        print(json.dumps({"devices": 1, "path": "plain_jit",
                          "rays_per_s": round(rate, 1)}), flush=True)
    n = 1
    while n <= total:
        rate = measure(n, args.rays_per_device)
        results[n] = rate
        eff = rate / (n * results[1])
        print(json.dumps({"devices": n, "path": "shard_map",
                          "rays_per_s": round(rate, 1),
                          "scaling_efficiency": round(eff, 3)}), flush=True)
        n *= 2


if __name__ == "__main__":
    main()
