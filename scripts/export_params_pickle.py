"""Export a training checkpoint's params as a single committable pickle.

`runs/` (and the orbax checkpoint dirs inside it) is wiped between build
rounds; a quality-curriculum stage checkpoint that must survive to the next
round has to live in git. Pickle keeps it a single dependency-free file
(`train/checkpoint.py` loads either format transparently).

Checkpoint-in-git POLICY (VERDICT r04 weak #7 — git history compounds):
the repo carries at most ONE warm-start pickle, the newest curriculum
stage, exported ``--dtype float16`` (half the bytes; a warm START does not
need full precision — the first optimizer steps re-establish it). A new
stage's export replaces (git rm) the previous one.

    python scripts/export_params_pickle.py --ckpt runs/quality_gen.ckpt \
        --dtype float16 --out artifacts/quality_gen_r05_stage2.pkl
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/quality_gen.ckpt")
    p.add_argument("--out", default="artifacts/quality_gen_r04_stage1.pkl")
    p.add_argument("--dtype", default=None, choices=[None, "float16"],
                   help="narrow float params to this dtype before writing "
                        "(committed warm starts: float16 halves the git "
                        "payload; loaders re-cast to the model dtype)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gens_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    payload = load_checkpoint(args.ckpt)
    params = payload["params"]
    if args.dtype == "float16":
        params = jax.tree.map(
            lambda x: (np.asarray(x, np.float16)
                       if np.issubdtype(np.asarray(x).dtype, np.floating)
                       else np.asarray(x)),
            params)
    out = {"epoch": int(payload.get("epoch", 0)),
           "step": int(payload.get("step", 0)),
           "params": params}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_checkpoint(args.out, out, use_orbax=False)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({mb:.1f} MB, step {out['step']})")


if __name__ == "__main__":
    main()
