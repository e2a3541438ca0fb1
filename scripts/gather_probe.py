"""Microbenchmarks that pin down the TPU gather cost model (round-3 kernel
design input; extends PERF.md "the gather problem").

E1  XLA jnp.take rate as a function of (rows, row_width, dtype) including
    4KB-tile-width rows — tests the hypothesis that every gathered row costs
    one full (8,128) HBM tile fetch (~4KB f32 / 2KB bf16), i.e. narrow rows
    waste the HBM interface proportionally.
E2  Pallas: vectorized dynamic gather from a VMEM-RESIDENT table inside a
    kernel (jnp.take on a VMEM ref). If Mosaic lowers this, small cascade
    scales can be gathered with ZERO per-row HBM traffic.
E3  Pallas: same gather but table left in HBM ("ANY"), per-tile DMA of the
    index block + jnp.take via VMEM-resident copy; measures what a fused
    gather+lerp kernel could achieve.

Usage: python scripts/gather_probe.py [--out GATHER_PROBE.json]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8):
    """Honest methodology (PERF.md): K iterations inside one jit via scan,
    per-iteration index jitter, timed on 2nd call."""

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
    return dt * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    key = jax.random.PRNGKey(0)
    results = {"device": jax.devices()[0].device_kind, "e1": [], "e2": [],
               "e3": []}

    # -- E1: XLA gather rate vs (rows, width, dtype) -------------------------
    M = 1 << 18  # table rows
    for n_log, width, dt in [
        (22, 4, "f32"), (22, 36, "f32"), (22, 36, "bf16"),
        (22, 128, "f32"), (21, 256, "f32"), (20, 512, "f32"),
        (20, 1024, "f32"), (20, 1024, "bf16"), (19, 2048, "bf16"),
        (17, 1024, "f32"), (15, 1024, "f32"),
    ]:
        N = 1 << n_log
        dtype = jnp.float32 if dt == "f32" else jnp.bfloat16
        table = jax.random.normal(key, (M, width), dtype)
        idx = jax.random.randint(key, (N,), 0, M)

        def g(i, t, ix):
            ix = (ix + i) % M
            return jnp.sum(jnp.take(t, ix, axis=0).astype(jnp.float32))

        ms = timed(g, table, idx, iters=args.iters)
        elem = 2 if dt == "bf16" else 4
        useful_gb = N * width * elem / 1e9
        row = {"rows": N, "width": width, "dtype": dt, "ms": round(ms, 3),
               "useful_gbps": round(useful_gb / (ms / 1e3), 1),
               "rows_per_us": round(N / (ms * 1e3), 1)}
        results["e1"].append(row)
        print("E1", row, flush=True)

    # -- E2: Pallas gather from VMEM-resident table --------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def vmem_gather_kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    def vmem_gather(table, idx, tile=2048):
        N = idx.shape[0]
        Mr, W = table.shape
        return pl.pallas_call(
            vmem_gather_kernel,
            grid=(N // tile,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Mr, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, W), table.dtype),
        )(idx, table)

    for Mr, W, dt in [(4096, 128, "f32"), (4096, 108, "f32"),
                      (729, 108, "f32"), (8192, 128, "bf16"),
                      (32768, 128, "bf16")]:
        dtype = jnp.float32 if dt == "f32" else jnp.bfloat16
        N = 1 << 20
        table = jax.random.normal(key, (Mr, W), dtype)
        idx = jax.random.randint(key, (N,), 0, Mr, jnp.int32)

        def g(i, t, ix):
            ix = (ix + i) % Mr
            return jnp.sum(vmem_gather(t, ix).astype(jnp.float32))

        try:
            ms = timed(g, table, idx, iters=args.iters)
            row = {"table_rows": Mr, "width": W, "dtype": dt,
                   "ms": round(ms, 3),
                   "rows_per_us": round(N / (ms * 1e3), 1)}
        except Exception as e:
            row = {"table_rows": Mr, "width": W, "dtype": dt,
                   "error": str(e)[:300]}
        results["e2"].append(row)
        print("E2", row, flush=True)

    # -- E3: same but XLA take for identical shapes (VMEM-table comparison) --
    for Mr, W, dt in [(4096, 128, "f32"), (32768, 128, "bf16")]:
        dtype = jnp.float32 if dt == "f32" else jnp.bfloat16
        N = 1 << 20
        table = jax.random.normal(key, (Mr, W), dtype)
        idx = jax.random.randint(key, (N,), 0, Mr, jnp.int32)

        def g(i, t, ix):
            ix = (ix + i) % Mr
            return jnp.sum(jnp.take(t, ix, axis=0).astype(jnp.float32))

        ms = timed(g, table, idx, iters=args.iters)
        row = {"table_rows": Mr, "width": W, "dtype": dt, "ms": round(ms, 3),
               "rows_per_us": round(N / (ms * 1e3), 1)}
        results["e3"].append(row)
        print("E3(xla)", row, flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
