"""Follow-up probes: (A) Pallas VMEM-resident dynamic gather in the
take_along_axis form Mosaic supports; (B) XLA scatter-add rates vs
(rows, width, dtype) — the training backward is scatter-bound; (C) bf16
narrow-row gather across populations (is 313 rows/us robust?).

Usage: python scripts/gather_probe2.py [--out ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8):
    @jax.jit
    def run(salt, *a):
        def body(acc, i):
            return acc + fn(i, *a), None

        acc, _ = jax.lax.scan(body, salt, jnp.arange(iters))
        return acc

    r = float(run(jnp.float32(0.0), *args))
    t0 = time.time()
    r = float(run(jnp.float32(1.0), *args))
    dt = (time.time() - t0) / iters
    assert np.isfinite(r)
    return dt * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    key = jax.random.PRNGKey(0)
    results = {"a_pallas_vmem": [], "b_scatter": [], "c_bf16": []}

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # -- A: Pallas VMEM gather, take_along_axis form -------------------------
    def k_tala(idx_ref, table_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None],
                                (idx_ref.shape[0], table_ref.shape[1]))
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)

    def k_onehot(idx_ref, table_ref, out_ref):
        # one-hot matmul gather: MXU does the addressing
        Mr = table_ref.shape[0]
        idx = idx_ref[:]
        oh = (idx[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (idx.shape[0], Mr), 1)).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(oh, table_ref[:].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)

    def make_pallas_gather(kernel, Mr, W, dtype, tile):
        def f(table, idx):
            N = idx.shape[0]
            return pl.pallas_call(
                kernel,
                grid=(N // tile,),
                in_specs=[
                    pl.BlockSpec((tile,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Mr, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, W), dtype),
            )(idx, table)
        return f

    for name, kernel, Mr, W, dt, tile in [
        ("tala", k_tala, 4096, 128, "f32", 2048),
        ("tala", k_tala, 32768, 128, "bf16", 2048),
        ("tala", k_tala, 35937, 108, "bf16", 2048),
        ("onehot", k_onehot, 729, 108, "f32", 2048),
        ("onehot", k_onehot, 4096, 128, "f32", 1024),
    ]:
        dtype = jnp.float32 if dt == "f32" else jnp.bfloat16
        N = 1 << 20
        table = jax.random.normal(key, (Mr, W), dtype)
        idx = jax.random.randint(key, (N,), 0, Mr, jnp.int32)
        g = make_pallas_gather(kernel, Mr, W, dtype, tile)

        def run1(i, t, ix):
            ix = (ix + i) % Mr
            return jnp.sum(g(t, ix).astype(jnp.float32))

        try:
            ms = timed(run1, table, idx, iters=args.iters)
            row = {"kind": name, "table_rows": Mr, "width": W, "dtype": dt,
                   "ms": round(ms, 3), "rows_per_us": round(N / (ms * 1e3), 1)}
        except Exception as e:
            row = {"kind": name, "table_rows": Mr, "width": W, "dtype": dt,
                   "error": str(e)[:300]}
        results["a_pallas_vmem"].append(row)
        print("A", row, flush=True)

    # -- B: XLA scatter-add rates ---------------------------------------------
    for n_log, width, dt in [(22, 4, "f32"), (22, 36, "f32"),
                             (22, 36, "bf16"), (20, 128, "f32"),
                             (22, 1, "f32")]:
        N = 1 << n_log
        M = 1 << 18
        dtype = jnp.float32 if dt == "f32" else jnp.bfloat16
        upd = jax.random.normal(key, (N, width), dtype)
        idx = jax.random.randint(key, (N,), 0, M, jnp.int32)

        def s(i, u, ix):
            ix = (ix + i) % M
            out = jnp.zeros((M, width), dtype)
            out = out.at[ix].add(u)
            return jnp.sum(out.astype(jnp.float32))

        ms = timed(s, upd, idx, iters=args.iters)
        row = {"rows": N, "width": width, "dtype": dt, "ms": round(ms, 3),
               "rows_per_us": round(N / (ms * 1e3), 1)}
        results["b_scatter"].append(row)
        print("B", row, flush=True)

    # -- C: bf16 narrow gather across populations ----------------------------
    for n_log, width in [(20, 36), (18, 36), (22, 108), (20, 108), (17, 108)]:
        N = 1 << n_log
        M = 1 << 18
        table = jax.random.normal(key, (M, width), jnp.bfloat16)
        idx = jax.random.randint(key, (N,), 0, M, jnp.int32)

        def g2(i, t, ix):
            ix = (ix + i) % M
            return jnp.sum(jnp.take(t, ix, axis=0).astype(jnp.float32))

        ms = timed(g2, table, idx, iters=args.iters)
        row = {"rows": N, "width": width, "dtype": "bf16", "ms": round(ms, 3),
               "rows_per_us": round(N / (ms * 1e3), 1)}
        results["c_bf16"].append(row)
        print("C", row, flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
