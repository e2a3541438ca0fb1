"""Checkpointing for both regimes (reference runner.py:124-132 train ckpts,
gens.py:45-61 finetune volume ckpts) via orbax, with a pickle fallback."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """payload: e.g. {'epoch': int, 'params': pytree, 'opt_state': pytree}."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(p for p in os.listdir(ckpt_dir) if p.endswith(".ckpt"))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None
