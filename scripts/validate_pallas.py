"""On-device numerical validation of the fused Pallas SDF-MLP kernel.

tests/test_pallas_mlp.py pins the kernel against the flax reference in
INTERPRET mode (CPU); this script runs the COMPILED kernel on the real
backend and compares against the jnp path at full model config — the gate
for trusting `sdf_fn_for_extraction`'s Pallas fast path in validation/mesh
extraction (renderer.py:498-510).

Usage (TPU ambient):
    python scripts/validate_pallas.py [--dims 64] [--n 262144]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", type=int, default=64)
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)

    from gens_tpu.config import Config
    from gens_tpu.models.gens import GenSModel
    from gens_tpu.ops.pallas_mlp import sdf_fused_fn

    cfg = Config()
    cfg.model.volume.volume_dims = tuple(
        max(args.dims >> i, 2) for i in range(5))
    model = GenSModel(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0), n_src_views=2)

    rng = np.random.RandomState(0)
    volumes = [jnp.asarray(rng.randn(d, d, d, 4).astype(np.float32) * 0.3)
               for d in cfg.model.volume.volume_dims]
    pts = jnp.asarray(
        rng.uniform(-1.05, 1.05, (args.n, 3)).astype(np.float32))

    mlp = {"sdf": params["sdf"]}
    ref_fn = jax.jit(model.renderer.sdf_fn(mlp, volumes))
    fused = jax.jit(sdf_fused_fn(params["sdf"], model.sdf_net.cfg, volumes,
                                 interpret=args.cpu))

    ref = np.asarray(ref_fn(pts))
    got = np.asarray(fused(pts))
    adiff = np.abs(ref - got)
    denom = np.maximum(np.abs(ref), 1e-3)
    rdiff = adiff / denom
    result = {
        "backend": jax.default_backend(),
        "dims": args.dims,
        "n_points": args.n,
        "max_abs_diff": float(adiff.max()),
        "p99_abs_diff": float(np.percentile(adiff, 99)),
        "max_rel_diff": float(rdiff.max()),
        "ref_range": [float(ref.min()), float(ref.max())],
        "pass_1e-3": bool(adiff.max() < 1e-3),
    }
    print(json.dumps(result, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
