"""CLI smoke test: ``python -m gens_tpu.main`` wiring end-to-end on the
synthetic fixture (reference main.py:5-24 + run.sh). In-process (main(argv))
so the jit compile cache is shared with the rest of the suite; the tiny
shapes mirror tests.test_forward.tiny_config."""

import glob
import json
import os
import tempfile

import pytest

from gens_tpu.main import main


def _tiny_overrides(tmp):
    return [
        "model.feature_network.d_enc=[8,8,8,8,8]",
        "model.volume.volume_dims=[32,16,8,4,2]",
        "model.sdf_network.d_hidden=48",
        "model.sdf_network.n_layers=4",
        "model.sdf_network.skip_in=[2]",
        "model.sdf_network.d_out=17",
        "model.render.n_samples=16",
        "model.render.n_importance=16",
        "model.render.up_sample_steps=2",
        "model.render.patch_size=5",
        "model.render.n_sparse_pts=64",
        "train_dataset.dataset_name=synthetic",
        "train_dataset.num_src_view=2",
        "train_dataset.img_hw=[64,64]",
        "train_dataset.n_rays=24",
        'train_dataset.scene=["s0","s1"]',
        "train.epochs=1",
        "train.warmup=1",
        "train.save_freq=1",
        "train.val_freq=100",
        f"base_exp_dir={tmp}",
    ]


def test_cli_train_writes_checkpoint_and_logs():
    tmp = tempfile.mkdtemp()
    main(["--mode", "train", "--set"] + _tiny_overrides(tmp))
    ckpts = glob.glob(os.path.join(tmp, "checkpoints", "*.ckpt"))
    assert ckpts, "CLI train wrote no checkpoint"
    logs = glob.glob(os.path.join(tmp, "logs", "*.jsonl"))
    assert logs, "CLI train wrote no metrics log"
    with open(logs[0]) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert any("loss" in r.get("scalars", r) or "loss" in str(r)
               for r in rows), f"no loss scalar logged: {rows[:2]}"
    # code backup (reference codes_backup, runner.py:400-403)
    assert os.path.isdir(os.path.join(tmp, "codes_recording", "gens_tpu"))


def test_cli_bad_flag_rejected():
    with pytest.raises(SystemExit):
        main(["--mode", "explode"])


def test_all_shipped_confs_load():
    """Every confs/*.yaml parses into the typed Config (unknown keys raise
    KeyError in _from_dict, so this catches schema drift — e.g. a conf
    shipping a knob that was renamed in config.py)."""
    import glob
    import os

    from gens_tpu.config import Config, load_config

    confs = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "confs", "*.yaml")))
    assert len(confs) >= 5, confs  # dtu, dtu_finetune, bmvs, bmvs_finetune,
    for path in confs:             # synthetic
        cfg = load_config(path)
        assert isinstance(cfg, Config), path
    # the DTU conf ships the pallas default this round's fixes harden
    dtu = load_config([p for p in confs if p.endswith("/dtu.yaml")][0])
    assert dtu.model.volume.packed_bilerp == "pallas"
    assert dtu.model.volume.splat_window == "auto"
    ftb = load_config([p for p in confs
                       if p.endswith("bmvs_finetune.yaml")][0])
    assert ftb.finetune_dataset.dataset_name == "bmvs"
