"""Summarize a reference-recipe feasibility run (VERDICT r04 item 6) into a
committed artifact.

The feasibility run drives the FULL Runner train path — epoch loop,
checkpoint saves, a val cycle that renders images and exports a mesh — at
reference scale (256^3 cascade, 5 views, 480x640, 512 rays, 64+64 samples,
pallas+bf16+save_gathers), the same duty as the reference's
`runner.py:117-282` train/validate loop on DTU. The exp dir itself is
gitignored (images/meshes/ckpts); this script distills it into one JSON:
steps completed, loss trajectory endpoints, NaN check, artifacts produced.

    python scripts/feasibility_summarize.py --exp runs/feasibility_r04 \
        --out FEASIBILITY_r04.json
"""

import argparse
import glob
import json
import math
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", default="runs/feasibility_r04")
    p.add_argument("--out", default="FEASIBILITY_r04.json")
    args = p.parse_args()

    out = {"exp_dir": args.exp}
    rows = []
    jl = os.path.join(args.exp, "logs", "metrics.jsonl")
    if os.path.exists(jl):
        with open(jl) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
    train = [r for r in rows if r.get("mode") == "train"]
    val = [r for r in rows if r.get("mode") == "val"]
    out["train_records"] = len(train)
    if train:
        out["last_step"] = max(r["step"] for r in train)
        first, last = train[0], train[-1]
        out["loss_first"] = first.get("loss")
        out["loss_last"] = last.get("loss")
        out["psnr_last"] = last.get("psnr")
        # every numeric scalar in every train record must be finite
        finite = all(math.isfinite(v) for r in train for v in r.values()
                     if isinstance(v, (int, float)))
        out["all_train_scalars_finite"] = bool(finite)
    if val:
        out["val_records"] = len(val)
        out["val_last"] = {k: v for k, v in val[-1].items()
                          if k not in ("time",)}
        # the runner logs val rows at the composite TB index
        # epoch*1000 + scene_idx (runner.py:636) while train rows carry the
        # global optimizer step — decode it so this artifact reports ONE
        # consistent unit (VERDICT r04 weak #6: `last_step: 141` vs
        # `val_last.step: 23000` confused the record)
        comp = out["val_last"].pop("step", None)
        if comp is not None:
            out["val_last"]["epoch"] = comp // 1000
            out["val_last"]["scene_idx"] = comp % 1000
    ckpts = sorted(glob.glob(os.path.join(args.exp, "checkpoints", "*")))
    out["checkpoints"] = [os.path.basename(c) for c in ckpts]
    meshes = sorted(glob.glob(os.path.join(args.exp, "meshes", "*.ply")))
    out["meshes"] = [os.path.basename(m) for m in meshes]
    out["mesh_bytes"] = [os.path.getsize(m) for m in meshes]
    imgs = sorted(sum((glob.glob(os.path.join(args.exp, sub, "*.png"))
                       for sub in ("val_img", "val_normal",
                                   "val_render_depth", "val_sdf_depth")),
                      []))
    out["val_image_files"] = len(imgs)
    ok = (bool(train) and out.get("all_train_scalars_finite") and
          bool(ckpts) and bool(meshes))
    out["ok"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("ok", "train_records")
                      if k in out}))


if __name__ == "__main__":
    main()
