"""Multi-host plumbing tests (gens_tpu/parallel/distributed.py).

Real multi-host hardware is not available in CI; what IS testable here:
env/SLURM rank detection (mirroring /root/reference/utils/distribute.py:66-89
semantics), the single-process no-op initialize path, mesh row-ownership
bookkeeping, per-process scene-index sharding, and the process-local array
assembly used by Runner._train_sharded — all on the virtual CPU mesh.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gens_tpu.parallel.distributed import (ProcessEnv, detect_process_env,
                                           initialize, is_main_process,
                                           local_data_rows,
                                           make_global_mesh,
                                           make_process_local_array,
                                           scene_indices_for_process)


@pytest.fixture
def clean_env(monkeypatch):
    for k in ("RANK", "WORLD_SIZE", "COORDINATOR_ADDRESS", "MASTER_ADDR",
              "MASTER_PORT", "SLURM_PROCID", "SLURM_NTASKS",
              "SLURM_NODELIST"):
        monkeypatch.delenv(k, raising=False)
    return monkeypatch


def test_detect_single_process(clean_env):
    env = detect_process_env()
    assert env == ProcessEnv(0, 1, None)
    assert not env.is_distributed


def test_detect_env_vars(clean_env):
    clean_env.setenv("RANK", "3")
    clean_env.setenv("WORLD_SIZE", "8")
    clean_env.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    env = detect_process_env()
    assert env == ProcessEnv(3, 8, "10.0.0.1:1234")
    assert env.is_distributed


def test_detect_torchrun_style(clean_env):
    clean_env.setenv("RANK", "1")
    clean_env.setenv("WORLD_SIZE", "2")
    clean_env.setenv("MASTER_ADDR", "hostA")
    clean_env.setenv("MASTER_PORT", "5555")
    assert detect_process_env().coordinator == "hostA:5555"


def test_detect_slurm(clean_env):
    clean_env.setenv("SLURM_PROCID", "2")
    clean_env.setenv("SLURM_NTASKS", "4")
    clean_env.setenv("SLURM_NODELIST", "node[3-7],node9")
    env = detect_process_env(default_port=999)
    assert env.rank == 2 and env.world_size == 4
    assert env.coordinator == "node3:999"


def test_initialize_single_process_noop(clean_env):
    env = initialize()
    assert env.world_size == 1
    assert is_main_process()


def test_global_mesh_and_rows():
    mesh = make_global_mesh(4, 2)
    assert mesh.shape == {"data": 4, "view": 2}
    rows = local_data_rows(mesh)
    # single process owns every row
    np.testing.assert_array_equal(rows, np.arange(4))


def test_scene_indices_for_process():
    order = np.arange(100, 120)
    rows = np.asarray([1, 3])
    idx = scene_indices_for_process(order, batch=2, n_data=4, rows=rows)
    np.testing.assert_array_equal(idx, [109, 111])


def test_make_process_local_array_roundtrip():
    mesh = make_global_mesh(2, 2)
    data = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    arr = make_process_local_array(mesh, P("data", "view"), data.shape, data)
    np.testing.assert_array_equal(np.asarray(arr), data)
    assert arr.sharding.spec == P("data", "view")
