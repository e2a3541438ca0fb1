"""End-to-end training smoke: overfit the synthetic sphere scene and verify
the learning dynamics (SURVEY.md §7.3: PSNR rises, Eikonal falls, extracted
mesh approximates the sphere).

Run on TPU (ambient env) or CPU:
    python scripts/overfit_synthetic.py [--steps 200] [--cpu]
"""

import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--mesh", action="store_true", help="extract + check mesh")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    import jax.numpy as jnp

    from gens_tpu.config import Config
    from gens_tpu.data.synthetic import make_scene, sphere_sdf
    from gens_tpu.models.gens import GenSModel
    from gens_tpu.train.step import init_train_state, make_train_step

    cfg = Config()
    m = cfg.model
    m.volume.volume_dims = (64, 32, 16, 8, 4)
    m.render.n_samples = 32
    m.render.n_importance = 32
    m.render.n_sparse_pts = 512
    cfg.train.epochs = max(args.steps, 1)
    cfg.train.warmup = max(args.steps // 10, 1)
    cfg.train.anneal_end = args.steps // 4
    cfg.train.loss.pseudo_sdf_weight = 0.0
    cfg.train.loss.pseudo_depth_weight = 0.0

    radius = 0.5
    model = GenSModel(cfg.model)
    state, _ = init_train_state(model, cfg, jax.random.PRNGKey(0),
                                steps_per_epoch=1)
    _, step_fn = make_train_step(model, cfg, steps_per_epoch=1)

    first = last = None
    t0 = time.time()
    for step in range(args.steps):
        raw = make_scene(n_views=3, hw=(128, 128), n_rays=256,
                         radius=radius, seed=step)
        inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}
        anneal = min(1.0, step / max(cfg.train.anneal_end, 1))
        state, metrics = step_fn(state, inputs, jax.random.PRNGKey(step),
                                 anneal, use_match_features=False)
        # fetch metrics sparsely: every host<->device sync pays tunnel
        # latency, which can stall for tens of seconds
        if step == 0 or step % 20 == 0 or step == args.steps - 1:
            scal = {k: float(v) for k, v in metrics.items()}
            if step == 0:
                first = scal
                print(f"compile+step0 in {time.time() - t0:.1f}s", flush=True)
            print(f"step {step}: loss {scal['loss']:.4f} psnr "
                  f"{scal['psnr']:.2f} eik {scal['eikonal_loss']:.4f} "
                  f"color {scal['color_loss']:.4f} "
                  f"[{time.time()-t0:.0f}s]", flush=True)
            last = scal

    print(f"{args.steps} steps in {time.time() - t0:.1f}s "
          f"({(time.time() - t0) / args.steps * 1e3:.0f} ms/step)")
    ok = last["psnr"] > first["psnr"] + 1.0 and last["loss"] < first["loss"]
    print(f"psnr {first['psnr']:.2f} -> {last['psnr']:.2f}; "
          f"loss {first['loss']:.3f} -> {last['loss']:.3f}; "
          f"{'OK' if ok else 'NOT CONVERGING'}")

    if args.mesh:
        from gens_tpu.mesh.extract import extract_geometry

        raw = make_scene(n_views=3, hw=(128, 128), n_rays=16, radius=radius)
        inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}
        scene = jax.jit(lambda p, i: model.build_scene(
            p, i["imgs"], i["intrs"], i["c2ws"]))(state.params, inputs)
        sdf_fn = model.renderer.sdf_fn(state.params, scene.volumes)
        verts, tris = extract_geometry(sdf_fn, [-1] * 3, [1] * 3,
                                       resolution=128, block=64)
        if len(verts):
            r = np.linalg.norm(verts, axis=-1)
            err = np.abs(r - radius)
            print(f"mesh: {len(verts)} verts, radius err mean "
                  f"{err.mean():.4f} p90 {np.percentile(err, 90):.4f}")
        else:
            print("mesh: EMPTY")
            ok = False

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
