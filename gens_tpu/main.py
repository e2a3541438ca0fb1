"""CLI entry point (re-design of /root/reference/main.py:5-24).

Usage:
    python -m gens_tpu.main --conf confs/dtu.yaml --mode train
    python -m gens_tpu.main --conf confs/dtu.yaml --mode val --resume CKPT
    python -m gens_tpu.main --conf confs/dtu_finetune.yaml --mode finetune \
        --resume CKPT --scene scan24 --ref_view 23
"""

from __future__ import annotations

import argparse

from gens_tpu.config import load_config
from gens_tpu.runner import Runner


def main(argv=None):
    parser = argparse.ArgumentParser("gens_tpu")
    parser.add_argument("--conf", type=str, default=None,
                        help="JSON/YAML config file")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "val", "finetune"])
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--mesh_resolution", type=int, default=None)
    parser.add_argument("--clean_mesh", action="store_true")
    parser.add_argument("--scene", type=str, default=None)
    parser.add_argument("--ref_view", type=int, default=None)
    parser.add_argument("--set", dest="overrides", nargs="*", default=[],
                        help="dotted config overrides, e.g. train.epochs=10")
    args = parser.parse_args(argv)

    # multi-host bring-up (env/SLURM rank detection; no-op single-process) —
    # must run before any JAX backend use
    from gens_tpu.parallel.distributed import initialize

    initialize()

    cfg = load_config(args.conf, args.overrides)
    if cfg.compilation_cache_dir:
        import jax

        from gens_tpu.utils.cache import compile_cache_dir

        d = cfg.compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir",
                          compile_cache_dir() if d == "auto" else d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    cfg.mode = args.mode
    if args.mesh_resolution is not None:
        cfg.mesh_resolution = args.mesh_resolution
    if args.clean_mesh:
        cfg.clean_mesh = True
    if args.scene is not None:
        cfg.finetune_dataset.scene = (args.scene,)
    if args.ref_view is not None:
        cfg.finetune_dataset.ref_view = (args.ref_view,)

    Runner(cfg).run(resume=args.resume)


if __name__ == "__main__":
    main()
