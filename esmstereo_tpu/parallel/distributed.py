"""Multi-host bootstrap and failure-recovery conventions.

The reference has no distributed layer (``nn.DataParallel`` pinned to one
GPU, SURVEY §2.3); this module defines the TPU-native multi-host story:

  * one process per host, ``jax.distributed.initialize()`` before first
    backend use (TPU pods auto-discover coordinator/rank from the
    environment);
  * global batch = per-host batch x process_count, with per-host data
    sharding via ``DataLoader(shard_index=process_index, ...)``;
  * failure model: TPU slices are gang-scheduled — on any host failure the
    job restarts and resumes from the latest checkpoint
    (``train.checkpoints.latest_checkpoint``); there is no in-job
    elasticity, matching ``--resume`` crash-restart semantics
    (``train_sceneflow.py:96-105``).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> dict:
    """Initialise multi-host JAX. No-ops for single-process runs.

    On TPU pods all arguments are auto-detected; on CPU/GPU test rigs pass
    them explicitly.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return topology_info()


def topology_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def assert_same_across_hosts(value, name: str = "value") -> None:
    """Guard against host-divergent config (e.g. mismatched batch sizes)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        jax.numpy.asarray(value))
    first = gathered[0]
    assert bool((gathered == first).all()), (
        f"{name} differs across hosts: {gathered}")
