"""Fold the per-config bench_train parts (runs/tb_*.json, written by
scripts/tpu_queue_r03.sh) into the round's TRAINBENCH artifact.

Merge-in-place: re-running after adding configs must not drop earlier
entries (same contract as quality_synthetic.py's artifact writes)."""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parts", default="runs/tb_*.json")
    p.add_argument("--out", default="TRAINBENCH_r03.json")
    args = p.parse_args()

    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    entries = merged.setdefault("entries", {})

    for path in sorted(glob.glob(args.parts)):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            part = json.load(f)
        cfgv = part.get("config", {})
        rec = dict(part.get("packed") or part.get("raw") or {})
        rec["dims"] = cfgv.get("dims")
        rec["agg_packed"] = cfgv.get("agg_packed")
        rec["bf16"] = cfgv.get("bf16")
        rec["views"] = cfgv.get("views")
        rec["rays"] = cfgv.get("rays")
        rec["hw"] = [cfgv.get("h"), cfgv.get("w")]
        entries[name] = rec

    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    rows = sorted(entries.items(),
                  key=lambda kv: (kv[1].get("dims") or 0, kv[0]))
    for name, r in rows:
        print(f"{name:28s} dims={r.get('dims')} agg={r.get('agg_packed')} "
              f"bf16={r.get('bf16')} -> {r.get('ms_per_step')} ms/step")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
