"""Multi-host (multi-process) distribution plumbing.

The reference runs multi-process DDP with env-var / SLURM rank detection and
``torch.distributed.init_process_group`` (/root/reference/utils/distribute.py:66-89).
The JAX equivalent is ``jax.distributed.initialize`` — after it, every process
sees the GLOBAL device list and a single ``Mesh`` spans all hosts; collectives
ride ICI within a slice and DCN across slices with no NCCL-style process-group
management.

Launch contract (mirrors the reference's ``env://`` rendezvous):

    # explicit env vars (any launcher)
    RANK=<process id> WORLD_SIZE=<n processes> \
    COORDINATOR_ADDRESS=host0:port python -m gens_tpu.main --conf ... &

    # SLURM (srun sets SLURM_PROCID/SLURM_NTASKS/SLURM_NODELIST)
    srun python -m gens_tpu.main --conf ...

    # Cloud TPU pods: run the same command on every worker with NO env vars;
    # jax.distributed.initialize() autodetects from the TPU metadata.

Single-process runs skip initialization entirely — every helper degrades to
the local-device behavior, so the same code path serves 1 host and N hosts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class ProcessEnv:
    """Resolved multi-process coordinates (reference utils/distribute.py:66-78
    reads RANK/WORLD_SIZE or SLURM_PROCID the same way)."""

    rank: int
    world_size: int
    coordinator: Optional[str]  # address:port of process 0 (None = autodetect)

    @property
    def is_distributed(self) -> bool:
        return self.world_size > 1


def detect_process_env(default_port: int = 29400) -> ProcessEnv:
    """Read process coordinates from the environment.

    Priority: explicit RANK/WORLD_SIZE -> SLURM -> single process. The
    coordinator address comes from COORDINATOR_ADDRESS, else MASTER_ADDR
    [+ MASTER_PORT] (torchrun-compatible), else the first SLURM node.
    """
    env = os.environ
    coordinator = env.get("COORDINATOR_ADDRESS")
    if coordinator is None and "MASTER_ADDR" in env:
        coordinator = (
            f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', default_port)}")

    if "RANK" in env and "WORLD_SIZE" in env:
        return ProcessEnv(int(env["RANK"]), int(env["WORLD_SIZE"]),
                          coordinator)
    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        if coordinator is None:
            nodelist = env.get("SLURM_NODELIST", "")
            # first entry of a SLURM nodelist; bracketed ranges take the
            # first index ("host[3-7,9]" -> "host3")
            head = nodelist.split(",")[0]
            if "[" in head:
                prefix, rng = head.split("[", 1)
                head = prefix + rng.split("-")[0].split(",")[0].rstrip("]")
            coordinator = f"{head}:{default_port}" if head else None
        return ProcessEnv(int(env["SLURM_PROCID"]), int(env["SLURM_NTASKS"]),
                          coordinator)
    return ProcessEnv(0, 1, coordinator)


_initialized = False


def initialize(penv: Optional[ProcessEnv] = None) -> ProcessEnv:
    """Bring up the JAX distributed runtime (idempotent).

    Call ONCE per process before any backend use. Single-process (world_size
    == 1 and no TPU-pod autodetect requested) is a no-op. Returns the
    resolved :class:`ProcessEnv`.
    """
    global _initialized
    if penv is None:
        penv = detect_process_env()
    if penv.is_distributed and not _initialized:
        import jax

        jax.distributed.initialize(
            coordinator_address=penv.coordinator,
            num_processes=penv.world_size,
            process_id=penv.rank,
        )
        _initialized = True
    return penv


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    """Host-0 gate for checkpointing/logging (reference is_main_process,
    utils/distribute.py:42-48; checkpoints are rank-0-only, runner.py:124)."""
    return process_index() == 0


def allreduce_host_sums(vec: np.ndarray) -> np.ndarray:
    """Sum a small host-side numpy vector across processes (the reference's
    metric reduction, utils/distribute.py:6-24, minus the rank-0-only
    divide). Single-process: identity. Multi-host: a process_allgather of
    the fixed-shape vector, then a host-side sum — cheap at scalar sizes and
    collective-safe (every process must call it)."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(vec)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(vec))).sum(axis=0)


def make_global_mesh(n_data: int, n_view: int):
    """Build the ('data', 'view') mesh over the GLOBAL device list.

    Device order: ``jax.devices()`` lists processes in a deterministic
    process-major global order, so reshaping to (n_data, n_view) gives each
    host a CONTIGUOUS block of data-axis rows with a scene's whole view axis
    intra-host — all-gather/psum over 'view' rides ICI and only the gradient
    pmean over 'data' crosses hosts (DCN), matching the bandwidth hierarchy.
    (Contiguous ascending rows are also what
    ``jax.make_array_from_process_local_data`` expects from each process.)
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n = n_data * n_view
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.array(devices[:n]).reshape(n_data, n_view)
    return Mesh(dev, ("data", "view"))


def local_data_rows(mesh) -> np.ndarray:
    """Data-axis rows whose devices are (partly) addressable by this process.

    The host only needs to materialize scene batches for these rows — the
    per-host dataset-sharding contract (the reference leans on
    DistributedSampler, datasets/__init__.py:33; here the mesh layout itself
    defines the shard).
    """
    import jax

    pid = jax.process_index()
    dev = np.asarray(mesh.devices)
    rows = [i for i in range(dev.shape[0])
            if any(d.process_index == pid for d in dev[i])]
    return np.asarray(rows, dtype=np.int64)


def scene_indices_for_process(order: np.ndarray, batch: int, n_data: int,
                              rows: np.ndarray) -> np.ndarray:
    """Dataset indices this process must load for step ``batch``: the rows of
    the (identically seeded, hence identical across hosts) permutation that
    map to this host's data-axis rows."""
    base = batch * n_data
    return order[base + rows]


def make_process_local_array(mesh, spec, global_shape, local_np):
    """Assemble a global jax.Array from this process's local shard(s).

    Single-process: a plain device_put with the target sharding. Multi-host:
    ``jax.make_array_from_process_local_data`` (each process contributes the
    rows it loaded).
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(np.ascontiguousarray(local_np), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_np), global_shape)
