"""Offline converter: torchvision MnasNet-1.0 weights -> gens_tpu encoder
params (run once on a machine with torchvision + the downloaded weights).

Usage:
    python scripts/convert_mnasnet_weights.py --out mnasnet_encoder.pkl \
        [--state_dict path/to/mnasnet1.0.pth]

Without --state_dict it tries ``torchvision.models.mnasnet1_0(pretrained=
True)``. The output pickle loads into MnasNetFeatureNetwork's encoder
subtree; decoder/head params remain randomly initialized (they are trained
from scratch in the reference too).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--state_dict", default=None)
    args = p.parse_args()

    import torch

    if args.state_dict:
        state = torch.load(args.state_dict, map_location="cpu")
        if "state_dict" in state:
            state = state["state_dict"]
    else:
        from torchvision import models

        state = models.mnasnet1_0(pretrained=True).state_dict()

    from gens_tpu.models.mnasnet import convert_torch_mnasnet

    tree = convert_torch_mnasnet({k: v.numpy() for k, v in state.items()})
    with open(args.out, "wb") as f:
        pickle.dump(tree, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
