"""Summarize a quality artifact against the one-fine-voxel bar and a
previous round's artifact (prints the QUALITY.md table rows + windowed
loss-curve statistics that back the convergence narrative)."""

import argparse
import json

import numpy as np


def curve_windows(curve, spans=((0, 1000), (4000, 6000), (10000, 12000),
                                (14000, 16001))):
    out = []
    for lo, hi in spans:
        sel = [p for p in curve if lo <= p["step"] < hi]
        if sel:
            out.append((f"{lo}-{hi}",
                        float(np.mean([p["loss"] for p in sel])),
                        float(np.mean([p["psnr"] for p in sel])),
                        float(np.mean([p["eikonal_loss"] for p in sel]))))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("artifact")
    p.add_argument("--prev", default=None)
    p.add_argument("--voxel-dim", type=int, default=128)
    args = p.parse_args()

    d = json.load(open(args.artifact))
    bar = 2.0 / args.voxel_dim
    print(f"one-fine-voxel bar at {args.voxel_dim}^3: {bar:.4f}")
    for tag in ("heldout", "heldout_union", "trained"):
        k = f"{tag}_acc_mean"
        if k in d:
            ratio = d[k] / bar
            print(f"{tag:14s} acc_mean {d[k]:.4f} ({ratio:.2f} voxels)  "
                  f"p50 {d.get(f'{tag}_acc_p50', float('nan')):.4f}  "
                  f"comp {d.get(f'{tag}_comp_mean', float('nan')):.4f}  "
                  f"overall {d.get(f'{tag}_overall', float('nan')):.4f}  "
                  f"psnr {d.get(f'{tag}_psnr', float('nan')):.2f}")
    if "gen_curve" in d:
        print("loss-curve windows (step range: loss / psnr / eikonal):")
        for name, lo, ps, ei in curve_windows(d["gen_curve"]):
            print(f"  {name:12s} {lo:.4f} / {ps:.2f} / {ei:.4f}")
    print(f"ms/step {d.get('gen_ms_per_step')}  "
          f"compile_s {d.get('gen_compile_s')}")
    if args.prev:
        prev = json.load(open(args.prev))
        for tag in ("heldout",):
            k = f"{tag}_acc_mean"
            if k in prev and k in d:
                print(f"vs prev: {tag} acc_mean {prev[k]:.4f} -> {d[k]:.4f} "
                      f"({prev[k] / max(d[k], 1e-9):.2f}x better)")


if __name__ == "__main__":
    main()
