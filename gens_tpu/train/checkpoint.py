"""Checkpointing for both regimes (reference runner.py:124-132 train ckpts,
gens.py:45-61 finetune volume ckpts).

Two interchangeable on-disk formats behind one API, each version-tagged:

* **orbax** (default when importable): an OCDBT checkpoint DIRECTORY at
  ``<path>/`` — async-capable and sharded-array-aware, which is what
  multi-host training needs (every process participates in the save; a
  replicated array is written once).
* **pickle**: a single file of numpy arrays — dependency-free fallback and
  the format round-1 checkpoints used (still loadable).

``load_checkpoint`` auto-detects the format from what's on disk.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

CKPT_FORMAT_VERSION = 2  # 1 = round-1 pickle (untagged); 2 = tagged


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any],
                    use_orbax: Optional[bool] = None) -> None:
    """payload: e.g. {'epoch': int, 'params': pytree, 'opt_state': pytree}.

    ``use_orbax=None`` picks orbax when available (required for multi-host:
    pickle of a non-fully-addressable array would fail), else pickle.
    """
    payload = dict(payload)
    payload["format_version"] = CKPT_FORMAT_VERSION
    ocp = _orbax() if use_orbax in (None, True) else None
    if use_orbax and ocp is None:
        raise RuntimeError("orbax requested but not importable")
    if ocp is not None:
        ckpt_path = os.path.abspath(path)
        if jax.process_index() == 0:
            os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(ckpt_path, payload, force=True)
        return
    if jax.process_count() > 1:
        raise RuntimeError(
            "multi-host checkpointing needs orbax (pickle cannot serialize "
            "process-spanning arrays)")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Auto-detects the on-disk format: an orbax checkpoint directory or a
    pickle file (incl. untagged round-1 checkpoints).

    ``target``: optional payload template (same tree as was saved, concrete
    values fine). Orbax serializes NamedTuples (e.g. optax opt_state) as
    plain dicts; restoring WITHOUT a target returns those dicts, which then
    fail pytree-structure matching inside the jitted train step. Pass the
    freshly-initialized payload to get the original structure back. Ignored
    for pickle (which preserves structure natively).
    """
    if os.path.isdir(path):
        ocp = _orbax()
        if ocp is None:
            raise RuntimeError(f"{path} is an orbax checkpoint but orbax is "
                               "not importable")
        if target is not None:
            # save_checkpoint stamps format_version into every payload;
            # callers' targets usually name only the keys they care about,
            # so inject the stamp to keep orbax's structure match happy
            if (isinstance(target, dict)
                    and "format_version" not in target):
                target = {**target, "format_version": CKPT_FORMAT_VERSION}
            with ocp.StandardCheckpointer() as ckptr:
                return ckptr.restore(os.path.abspath(path), target)
        # no target: restore as NUMPY. The default restore re-applies the
        # shardings recorded at save time, which fails when the checkpoint
        # was written on different hardware (TPU-saved -> CPU-restored:
        # "Device TPU v5 lite0 was not found"); numpy is host-portable and
        # callers jnp.asarray what they need.
        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(os.path.abspath(path)).item_metadata
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
                dict(meta) if hasattr(meta, "keys") else meta)
            return ckptr.restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(restore_args=restore_args))
    with open(path, "rb") as f:
        payload = pickle.load(f)
    payload.setdefault("format_version", 1)
    return payload


def latest_checkpoint(ckpt_dir: str,
                      exclude: tuple = ("emergency.ckpt",)) -> Optional[str]:
    """Newest checkpoint by mtime (name as tiebreak): epoch checkpoints and
    preemption checkpoints ('preempt.ckpt') interleave, so lexical order
    would rank a stale preempt.ckpt above a newer model_NNN.ckpt.

    ``emergency.ckpt`` (written by the non-finite-loss failure handler,
    runner._flush_metrics) is excluded by default: it carries the exact
    params that just produced a NaN, so an auto-restart loop resuming it
    would re-crash forever. Auto-resume picks the last GOOD checkpoint; the
    emergency one stays on disk for debugging."""
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = [os.path.join(ckpt_dir, p) for p in os.listdir(ckpt_dir)
             if p.endswith(".ckpt") and p not in exclude]
    return max(ckpts, key=lambda p: (os.path.getmtime(p), p),
               default=None)
