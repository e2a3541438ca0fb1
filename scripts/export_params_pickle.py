"""Export a training checkpoint's params as a single committable pickle.

`runs/` (and the orbax checkpoint dirs inside it) is wiped between build
rounds; a quality-curriculum stage checkpoint that must survive to the next
round has to live in git. Pickle keeps it a single dependency-free file
(`train/checkpoint.py` loads either format transparently).

    python scripts/export_params_pickle.py --ckpt runs/quality_gen.ckpt \
        --out artifacts/quality_gen_r04_stage1.pkl
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/quality_gen.ckpt")
    p.add_argument("--out", default="artifacts/quality_gen_r04_stage1.pkl")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from gens_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    payload = load_checkpoint(args.ckpt)
    out = {"epoch": int(payload.get("epoch", 0)),
           "step": int(payload.get("step", 0)),
           "params": payload["params"]}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_checkpoint(args.out, out, use_orbax=False)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({mb:.1f} MB, step {out['step']})")


if __name__ == "__main__":
    main()
