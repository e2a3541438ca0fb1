"""Decompose the fused SDF value+grad+smooth pass (the top render stage).

Same honest-timing harness as profile_render.py: ITERS iterations inside one
jit with per-iteration jitter, big arrays as jit arguments. Stages isolate
the cascade gather, the PE+MLP, and each autodiff composition so we can see
which derivative pass costs what — and whether a bf16 MLP moves the needle.
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
from gens_tpu.models.sdf_net import SDFNetwork
from gens_tpu.ops.interp import lookup_volume_cascade_supercell

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

    float(np.asarray(loop(pts0, *ctx)))  # compile + warm
    t0 = time.time()
    val = float(np.asarray(loop(pts0, *ctx)))
    dt = (time.time() - t0) / ITERS * 1e3
    assert np.isfinite(val)
    print(f"{name:44s} {dt:8.2f} ms/iter")
    return dt


def main():
    cfg = Config()
    cfg.model.sdf_network.volume_dtype = "bfloat16"
    cfg.model.sdf_network.packed_trilerp = True
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)
    raw = make_scene(n_views=3, hw=(480, 640), n_rays=1024)
    inputs = {k: jnp.asarray(v) for k, v in raw.items() if k != "radius"}

    build = jax.jit(lambda p, i: model.build_scene(
        p, i["imgs"], i["intrs"], i["c2ws"]))
    scene = build(params, inputs)
    packed = scene.packed_volumes
    sdf_params = params["sdf"]
    sdf_cfg = cfg.model.sdf_network

    pts0 = jax.random.uniform(jax.random.PRNGKey(1), (N_PTS, 3),
                              minval=-0.5, maxval=0.5)

    sdf_mod = model.renderer.sdf

    # -- stages ---------------------------------------------------------
    # packed tables ride as jit ARGUMENTS (pytree), never closure constants
    timeit("cascade gather (packed, bf16)",
           lambda p, pk: lookup_volume_cascade_supercell(pk, p), pts0, packed)

    timeit("full forward", lambda p, w, pk: sdf_mod.apply(w, p, pk),
           pts0, sdf_params, packed)

    def grad_rev(p, w, pk):
        return jax.grad(lambda q: sdf_mod.apply(w, q, pk,
                                                method=SDFNetwork.sdf).sum())(p)

    timeit("grad (reverse)", grad_rev, pts0, sdf_params, packed)

    def grad_fwd(p, w, pk):
        # 3 jvp passes, one per coordinate direction
        f = lambda q: sdf_mod.apply(w, q, pk, method=SDFNetwork.sdf)
        outs = []
        for d in range(3):
            t = jnp.zeros_like(p).at[:, d].set(1.0)
            outs.append(jax.jvp(f, (p,), (t,))[1])
        return jnp.stack(outs, -1)

    timeit("grad (3x forward jvp)", grad_fwd, pts0, sdf_params, packed)

    def fused_current(p, w, pk):
        def grad_fn(q):
            out, vjp = jax.vjp(lambda r: sdf_mod.apply(w, r, pk), q)
            ct = jnp.zeros_like(out).at[:, 0].set(1.0)
            (g,) = vjp(ct)
            return g, out
        (g, out), (sm, _) = jax.jvp(grad_fn, (p,), (jnp.ones_like(p),))
        return out, g, sm

    timeit("fused value+grad+smooth (jvp-of-vjp)", fused_current,
           pts0, sdf_params, packed)

    def fused_rev_over_fwd(p, w, pk):
        # smooth = grad of the directional derivative along ones;
        # grad + value from the same vjp as the current path
        f = lambda q: sdf_mod.apply(w, q, pk)

        def dir_deriv(q):
            out, tang = jax.jvp(f, (q,), (jnp.ones_like(q),))
            return tang[:, 0].sum(), out
        (_, out), vjpf = jax.vjp(dir_deriv, p)
        sm = vjpf((1.0, jnp.zeros_like(out)))[0]
        out2, vjp2 = jax.vjp(f, p)
        ct = jnp.zeros_like(out2).at[:, 0].set(1.0)
        g = vjp2(ct)[0]
        return out2, g, sm

    timeit("fused alt (vjp-of-jvp + separate grad)", fused_rev_over_fwd,
           pts0, sdf_params, packed)

    # bf16 MLP ceiling: params + compute in bf16 (numerics unchecked here,
    # this is a speed-of-light probe)
    bf16_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, sdf_params)

    timeit("full forward (bf16 params+pts)",
           lambda p, w, pk: sdf_mod.apply(w, p.astype(jnp.bfloat16), pk),
           pts0, bf16_params, packed)

    def fused_bf16(p, w, pk):
        def grad_fn(q):
            out, vjp = jax.vjp(
                lambda r: sdf_mod.apply(w, r.astype(jnp.bfloat16), pk), q)
            ct = jnp.zeros_like(out).at[:, 0].set(1.0)
            (g,) = vjp(ct)
            return g, out
        (g, out), (sm, _) = jax.jvp(grad_fn, (p,), (jnp.ones_like(p),))
        return out, g, sm

    timeit("fused value+grad+smooth (bf16)", fused_bf16,
           pts0, bf16_params, packed)


if __name__ == "__main__":
    main()
