"""Multi-host orchestration (jax.distributed) and per-host data sharding.

The reference is strictly single-process (SURVEY.md §2: no comm backend at
all).  On a multi-host pod slice each host runs this same program:

    from cgr_mpnn_3d_tpu.parallel import multihost
    multihost.initialize()                       # env-driven coordinator
    mesh = make_mesh(n_dp=jax.device_count())    # global mesh over all hosts
    rows = multihost.host_shard(len(dataset))    # disjoint per-host rows

Data parallelism over hosts = each host feeds the packed sub-batches for its
own devices; gradients cross hosts through the same ``psum`` over 'dp'
(GSPMD routes intra-slice traffic over ICI and cross-host over DCN).

This module is exercised in single-process form by tests (host_shard math,
initialize no-op path); real multi-host runs take coordinator settings from
the standard env vars or explicit arguments.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["initialize", "host_shard", "is_primary", "sync_global_devices"]

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process.

    No-op for single-process runs (the common case on one host).  Arguments
    default to JAX's standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) / TPU metadata autodetection.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_str = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None)
    pid_str = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None)
    if coordinator_address is None and num_processes is None:
        return  # single-process
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def is_primary() -> bool:
    return jax.process_index() == 0


def host_shard(n_rows: int, process_id: int | None = None,
               num_processes: int | None = None) -> np.ndarray:
    """Disjoint, near-equal row split for this host's input pipeline."""
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    return np.arange(pid, n_rows, nproc)


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier (e.g. before checkpoint rename)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)
