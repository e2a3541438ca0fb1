"""Compile + parity probe for the Pallas splat kernel ON THE REAL CHIP.

The kernel's interpret-mode tests (tests/test_pallas_splat.py) prove the
math but not Mosaic legality — the original single-matmul formulation
compiled fine in interpret mode yet was rejected by the TPU backend
("infer-vector-layout: unsupported shape cast"). This probe compiles the
kernel at the bench/reference window sizes and checks the splat against
jax.grad of the plain bilerp, all on device. Fast (<1 min warm).

Usage: python scripts/splat_compile_probe.py [--out SPLAT_PROBE.json]
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
    p.add_argument("--hw", default="480,640")
    p.add_argument("--window", default="159,163")
    p.add_argument("--channels", type=int, default=8)
    p.add_argument("--tiles", type=int, default=64)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    from gens_tpu.ops.interp import bilerp
    from gens_tpu.ops.pallas_splat import TILE, splat_bilinear

    H, W = (int(s) for s in args.hw.split(","))
    WBu, WBv = (int(s) for s in args.window.split(","))
    C, n_tiles = args.channels, args.tiles

    rng = np.random.RandomState(0)
    # per-tile clustered queries (the tiling contract: each TILE block spans
    # less than the window), plus out-of-image strays with zero cotangent
    base = rng.uniform([0, 0], [W - WBu, H - WBv], size=(n_tiles, 1, 2))
    xy = (base + rng.uniform(0, [WBu - 2, WBv - 2],
                             size=(n_tiles, TILE, 2))).astype(np.float32)
    xy[0, :8] = [[-50.0, -7.0]]  # strays: clipped window, zero cotangent
    ct = rng.randn(n_tiles, TILE, C).astype(np.float32)
    ct[0, :8] = 0.0

    xy_j = jnp.asarray(xy)
    ct_j = jnp.asarray(ct)

    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret mode
    fn = jax.jit(lambda a, b: splat_bilinear(a, b, (H, W), (WBu, WBv),
                                             interpret=interp,
                                             mm_dtype=jnp.float32))
    t0 = time.time()
    dimg = np.asarray(fn(xy_j, ct_j))
    t_compile = time.time() - t0

    # reference adjoint: vjp of the plain gather-side bilerp
    img0 = jnp.zeros((H, W, C), jnp.float32)
    _, vjp = jax.vjp(lambda im: bilerp(im, xy_j.reshape(-1, 2)), img0)
    ref = np.asarray(vjp(ct_j.reshape(-1, C))[0])

    err = float(np.abs(dimg - ref).max())
    scale = float(np.abs(ref).max())
    # timing (warm)
    t0 = time.time()
    for _ in range(10):
        r = fn(xy_j, ct_j)
    jax.block_until_ready(r)
    ms = (time.time() - t0) / 10 * 1e3

    out = {"device": jax.devices()[0].device_kind,
           "hw": [H, W], "window": [WBu, WBv], "channels": C,
           "tiles": n_tiles, "compile_s": round(t_compile, 1),
           "max_abs_err": err, "ref_max": scale,
           "ms_warm": round(ms, 3),
           "rows_per_us": round(n_tiles * TILE / (ms * 1e3), 1)}
    print(json.dumps(out), flush=True)
    assert err <= 1e-5 * max(scale, 1.0), (err, scale)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
