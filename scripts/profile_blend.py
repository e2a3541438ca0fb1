"""Measure the lookup_feature+blending stage with f32 vs bf16 blending MLPs,
and the color delta between the two (PSNR of bf16-blend vs f32-blend colors).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gens_tpu.utils.cache import enable_compile_cache
enable_compile_cache(jax)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gens_tpu.config import Config
from gens_tpu.data.synthetic import make_scene
from gens_tpu.models.gens import GenSModel
from gens_tpu.models.blending_net import BlendingNetwork
from gens_tpu.ops.projection import lookup_feature

ITERS = 20
N_PTS = 1024 * 128


def timeit(name, stage_fn, pts0, *ctx):
    @jax.jit
    def loop(pts0, *ctx):
        def body(i, acc):
            jitter = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0), i),
                pts0.shape, minval=-1e-4, maxval=1e-4)
            out = stage_fn(pts0 + jitter, *ctx)
            return acc + sum(jnp.sum(o.astype(jnp.float32))
                             for o in jax.tree_util.tree_leaves(out))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    float(np.asarray(loop(pts0, *ctx)))
    t0 = time.time()
    val = float(np.asarray(loop(pts0, *ctx)))
    dt = (time.time() - t0) / ITERS * 1e3
    assert np.isfinite(val)
    print(f"{name:44s} {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    import dataclasses

    cfg = Config()
    cfg.model.sdf_network.volume_dtype = "bfloat16"
    cfg.model.sdf_network.packed_trilerp = True
    cfg.model.color_network.packed_bilerp = True
    cfg.model.color_network.packed_dtype = "bfloat16"
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    raw = make_scene(n_views=3, hw=(480, 640), n_rays=1024)
    inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}

    build = jax.jit(lambda p, i: model.build_scene(
        p, i["imgs"], i["intrs"], i["c2ws"]))
    scene = build(params, inputs)

    pts0 = jax.random.uniform(jax.random.PRNGKey(1), (N_PTS, 3),
                              minval=-0.5, maxval=0.5)

    blend32 = BlendingNetwork(cfg.model.color_network)
    blend16 = BlendingNetwork(dataclasses.replace(
        cfg.model.color_network, mlp_dtype="bfloat16"))
    bparams = params["blending"]

    def stage(p, w, scene, net):
        rgb_feat, ray_diff, view_mask = lookup_feature(
            p, scene.imgs, scene.intrs, scene.c2ws, scene.features,
            packed_features=scene.packed_features,
            packed_imgs=scene.packed_imgs)
        return net.apply(w, rgb_feat, ray_diff, view_mask)

    timeit("lookup_feature + blending (f32 MLP)",
           lambda p, w, s: stage(p, w, s, blend32), pts0, bparams, scene)
    timeit("lookup_feature + blending (bf16 MLP)",
           lambda p, w, s: stage(p, w, s, blend16), pts0, bparams, scene)

    c32 = jax.jit(lambda p, w, s: stage(p, w, s, blend32))(pts0, bparams, scene)
    c16 = jax.jit(lambda p, w, s: stage(p, w, s, blend16))(pts0, bparams, scene)
    mse = float(jnp.mean((c32 - c16) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    print(f"bf16-vs-f32 blend color PSNR: {psnr:.1f} dB "
          f"(max abs {float(jnp.abs(c32 - c16).max()):.4f})", flush=True)


if __name__ == "__main__":
    main()
