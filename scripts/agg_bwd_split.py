"""Stage-split of the aggregation BACKWARD's 903 ms (VERDICT r04 next #2):
where does the measured time go, relative to the ~130 ms MXU floor the
windowed hat-matmuls themselves need?

Components measured in isolation at the MFU rig (5 views, 480x640, 256^3
finest scale, C=4, bf16 table, auto windows — exactly MFU_r04's agg config):

* ``proj``            — projection math for all voxels x views (what
                        save_gathers recomputes in the backward)
* ``pack``            — pack_supercell2d of the 5-view feature maps
* ``gather_fwd``      — the bf16 supercell gathers (the forward's cost)
* ``tile_transpose``  — tile_grid_queries of xy+ct (the kernel's input
                        permutation, paid once per view x slab)
* ``splat_kernel``    — the Pallas splat alone on pre-tiled inputs,
                        impl variants: v1 (per_channel, 1 tile/step) and
                        v2 (fused_u single matmul, 4 tiles/step)
* ``agg_fwdbwd_*``    — end-to-end aggregate_scale value+grad per impl
                        ("kernel" = v1 shipped, "kernel2" = r05 candidate)

Methodology: mfu.py's scan-of-K with per-iteration jitter, timed on the
2nd call (the tunneled device lies to block_until_ready; a scalar readback
that data-depends on the work is the only honest sync).

    python scripts/agg_bwd_split.py --out runs/AGG_SPLIT_r05.json
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
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--dims", type=int, default=256)
    p.add_argument("--h", type=int, default=480)
    p.add_argument("--w", type=int, default=640)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--scale", type=int, default=0,
                   help="cascade scale for the isolated stages (0 = finest "
                        "= ~88%% of the rows)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--stages", default="proj,pack,gather_fwd,tile_transpose,"
                                       "splat,agg")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gens_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(jax)
    import jax.numpy as jnp

    from gens_tpu.data.synthetic import make_scene
    from gens_tpu.models.volume import aggregate_scale
    from gens_tpu.ops.interp import bilerp_supercell, pack_supercell2d
    from gens_tpu.ops.pallas_splat import (
        required_windows_cascade, splat_bilinear, tile_grid_queries)
    from gens_tpu.ops.projection import scale_intrinsics

    V, H, W = args.views, args.h, args.w
    dim = max(args.dims >> args.scale, 2)
    C = 4
    volume_dims = tuple(max(args.dims >> i, 2) for i in range(5))
    raw = make_scene(n_views=V, hw=(H, W), n_rays=16)
    intrs = jnp.asarray(raw["intrs"])
    c2ws = jnp.asarray(raw["c2ws"])
    wins = required_windows_cascade(np.asarray(raw["intrs"]),
                                    np.asarray(raw["c2ws"]),
                                    volume_dims, (H, W))
    win = wins[args.scale]
    H_s, W_s = max(H >> args.scale, 1), max(W >> args.scale, 1)
    print(f"dim={dim} scale={args.scale} window={win} "
          f"feat=({V},{H_s},{W_s},{C})", flush=True)

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(V, H_s, W_s, C).astype(np.float32))

    K = args.iters
    results = {"config": vars(args), "windows": wins, "stages": {}}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            results["stages"].update(json.load(f).get("stages", {}))

    def measure(name, fn, init):
        @jax.jit
        def run(salt, *a):
            def body(acc, i):
                return acc + fn(i, *a), None
            acc, _ = jax.lax.scan(body, salt, jnp.arange(K))
            return acc

        t0 = time.time()
        a0 = float(run(jnp.float32(0.125), *init))
        compile_s = time.time() - t0
        t0 = time.time()
        a1 = float(run(jnp.float32(0.25), *init))
        ms = (time.time() - t0) / K * 1e3
        assert np.isfinite(a0) and np.isfinite(a1), name
        results["stages"][name] = {"ms": round(ms, 2),
                                   "compile_s": round(compile_s, 1)}
        print(f"{name:28s} {ms:9.1f} ms", flush=True)

    stages = args.stages.split(",")
    intrs_s = scale_intrinsics(intrs, args.scale)

    # the same slab decomposition aggregate_scale uses
    slab = max(1, min(dim, (2 ** 21) // (dim * dim)))
    while dim % slab:
        slab -= 1
    n_slabs = dim // slab
    r = np.linspace(-1.0, 1.0, dim, dtype=np.float32)
    gy, gz = np.meshgrid(r, r, indexing="ij")

    def slab_xy(view, s):
        """Projected pixel coords of slab s in view (host-side numpy)."""
        xs = r[s * slab:(s + 1) * slab]
        pts = np.stack([
            np.broadcast_to(xs[:, None, None], (slab, dim, dim)),
            np.broadcast_to(gy[None], (slab, dim, dim)),
            np.broadcast_to(gz[None], (slab, dim, dim)),
        ], axis=-1).reshape(-1, 3)
        w2c = np.linalg.inv(np.asarray(raw["c2ws"][view]))
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        uvw = cam @ np.asarray(scale_intrinsics(
            jnp.asarray(raw["intrs"][view]), args.scale)).T
        xy = uvw[:, :2] / (uvw[:, 2:] + 1e-8)
        live = ((np.abs(xy[:, 0] / ((W_s - 1) / 2.0) - 1.0) <= 1)
                & (np.abs(xy[:, 1] / ((H_s - 1) / 2.0) - 1.0) <= 1)
                & (cam[:, 2] > 0))
        return xy.astype(np.float32), live

    if "proj" in stages:
        pts_all = jnp.asarray(np.stack([
            np.broadcast_to(r[:, None, None], (dim, dim, dim)),
            np.broadcast_to(gy[None], (dim, dim, dim)),
            np.broadcast_to(gz[None], (dim, dim, dim)),
        ], axis=-1).reshape(-1, 3))

        def proj(i, pts, intr, c2w):
            acc = jnp.float32(0)
            for v in range(V):
                with jax.default_matmul_precision("highest"):
                    w2c = jnp.linalg.inv(c2w[v])
                    cam = (pts * (1 + 1e-6 * i)) @ w2c[:3, :3].T + w2c[:3, 3]
                    uvw = cam @ intr[v].T
                xy = uvw[:, :2] / (uvw[:, 2:] + 1e-8)
                nx = xy[:, 0] / ((W_s - 1) / 2.0) - 1.0
                ny = xy[:, 1] / ((H_s - 1) / 2.0) - 1.0
                m = ((jnp.abs(nx) <= 1) & (jnp.abs(ny) <= 1)
                     & (cam[:, 2] > 0))
                acc += jnp.sum(xy) * 1e-9 + jnp.sum(m)
            return acc.astype(jnp.float32)

        measure("proj_all_views", proj, (pts_all, intrs_s, c2ws))

    if "pack" in stages:
        def pack(i, f):
            t = pack_supercell2d(f * (1 + 1e-6 * i)).table
            return jnp.sum(t.astype(jnp.bfloat16).astype(jnp.float32)
                           ).astype(jnp.float32)

        measure("pack_supercell", pack, (feat,))

    # pre-tiled per-slab inputs for the isolated gather/splat runs.
    # ONE view only — all five would hold ~11 GB of (xy, ct, tiled copies)
    # at 256³; the per-view cost is uniform (same row count), so the
    # full-cascade number is stage_ms x V (noted in the row names).
    xy_np, live_np = [], []
    for s in range(n_slabs):
        xy_vs, live_vs = slab_xy(0, s)
        xy_np.append(xy_vs)
        live_np.append(live_vs)
    xy_flat = jnp.asarray(np.stack(xy_np))        # (n_slabs, Ns, 2)
    ct_flat = jnp.asarray(
        (np.stack(live_np)[..., None]
         * rng.randn(n_slabs, slab * dim * dim, C)).astype(np.float32))
    n_inst = n_slabs

    packed = pack_supercell2d(feat)
    table_lo = packed.table.astype(jnp.bfloat16)

    if "gather_fwd" in stages:
        def gather(i, tlo, xyf):
            acc = jnp.float32(0)
            for s in range(n_inst):
                vals = bilerp_supercell(tlo[0], (H_s, W_s),
                                        xyf[s] * (1 + 1e-7 * i))
                acc += jnp.sum(vals.astype(jnp.float32))
            return acc

        measure("gather_fwd_bf16_1view", gather, (table_lo, xy_flat))

    if "tile_transpose" in stages:
        def tt(i, xyf, ctf):
            acc = jnp.float32(0)
            for j in range(n_inst):
                xt = tile_grid_queries(xyf[j] * (1 + 1e-7 * i),
                                       (slab, dim, dim))
                ct_t = tile_grid_queries(ctf[j], (slab, dim, dim))
                acc += jnp.sum(xt) * 1e-6 + jnp.sum(ct_t) * 1e-6
            return acc.astype(jnp.float32)

        measure("tile_transpose_1view", tt, (xy_flat, ct_flat))

    if "splat" in stages:
        xy_t = jnp.stack([tile_grid_queries(xy_flat[j], (slab, dim, dim))
                          for j in range(n_inst)])
        ct_t = jnp.stack([tile_grid_queries(ct_flat[j], (slab, dim, dim))
                          for j in range(n_inst)])

        def mk_splat(layout, tpb):
            def run_splat(i, xt, ctt):
                acc = jnp.float32(0)
                for j in range(n_inst):
                    d = splat_bilinear(xt[j], ctt[j] * (1 + 1e-7 * i),
                                       (H_s, W_s), window=tuple(win),
                                       layout=layout, tiles_per_step=tpb)
                    acc += jnp.sum(d)
                return acc
            return run_splat

        for name, layout, tpb in [
                ("splat_v1_perch_tpb1_1view", "per_channel", 1),
                ("splat_v2_fused_tpb1_1view", "fused_u", 1),
                ("splat_v2_fused_tpb4_1view", "fused_u", 4),
                ("splat_v2_fused_tpb8_1view", "fused_u", 8)]:
            try:
                measure(name, mk_splat(layout, tpb), (xy_t, ct_t))
            except Exception as e:
                results["stages"][name] = {"error": str(e)[:400]}
                print(f"{name}: FAILED {str(e)[:200]}", flush=True)

        # the projection-coherent FORWARD kernel vs the bf16 gather forward
        from gens_tpu.ops.pallas_splat import bilerp_window_fwd

        lv_t = jnp.stack([
            tile_grid_queries(
                jnp.asarray(live_np[j].astype(np.float32))[:, None],
                (slab, dim, dim))[..., 0]
            for j in range(n_inst)])

        def mk_fwd(tpb):
            def run_fwd(i, xt, lvt, img):
                acc = jnp.float32(0)
                for j in range(n_inst):
                    vals = bilerp_window_fwd(img * (1 + 1e-6 * i), xt[j],
                                             lvt[j], window=tuple(win),
                                             tiles_per_step=tpb)
                    acc += jnp.sum(vals)
                return acc
            return run_fwd

        for tpb in (4, 8):
            try:
                measure(f"window_fwd_tpb{tpb}_1view", mk_fwd(tpb),
                        (xy_t, lv_t, feat[0]))
            except Exception as e:
                results["stages"][f"window_fwd_tpb{tpb}_1view"] = {
                    "error": str(e)[:400]}
                print(f"window_fwd_tpb{tpb}: FAILED {str(e)[:200]}",
                      flush=True)

    if "agg" in stages:
        combos = [(impl, "save_gathers")
                  for impl in ("kernel", "kernel2", "kernel2f")]
        combos += [("kernel2", "save_gathers_proj"),
                   ("kernel2f", "save_gathers_proj")]
        for impl, remat in combos:
            def agg_bwd(i, f, impl=impl, remat=remat):
                def loss(ff):
                    vol, _ = aggregate_scale(
                        ff * (1 + 1e-6 * i), intrs, c2ws, dim, args.scale,
                        packed_bilerp="pallas", splat_window=tuple(win),
                        splat_impl=impl, agg_remat=remat)
                    return jnp.sum(vol.astype(jnp.float32) ** 2)
                g = jax.grad(loss)(f)
                return jnp.sum(g).astype(jnp.float32)

            name = (f"agg_fwdbwd_{impl}" if remat == "save_gathers"
                    else f"agg_fwdbwd_{impl}@{remat}")
            try:
                measure(name, agg_bwd, (feat,))
            except Exception as e:
                results["stages"][name] = {"error": str(e)[:400]}
                print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    print(json.dumps(results["stages"], indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
