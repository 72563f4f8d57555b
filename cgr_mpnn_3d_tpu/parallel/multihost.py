"""Multi-host orchestration (jax.distributed) and per-host data sharding.

The reference is strictly single-process (SURVEY.md §2: no comm backend at
all).  On a multi-host pod slice each host runs this same program — the
shipped CLI does exactly this (cli/train.py calls :func:`initialize` before
touching devices, and RxnGraphTrainer routes batches through
:func:`globalize_group` whenever ``jax.process_count() > 1``):

    from cgr_mpnn_3d_tpu.parallel import multihost
    multihost.initialize()                       # env-driven coordinator
    mesh = make_mesh(n_dp=jax.device_count())    # global mesh over all hosts
    cells = multihost.local_mesh_cells(mesh)     # this host's mesh coords

Data parallelism over hosts = each host packs the sub-batches for its own
devices (window-granular host sharding — the multi-device analog of
``host_shard``) and assembles them into ONE global jax.Array per step with
:func:`globalize_group`; gradients cross hosts through the same ``psum``
over 'dp' (GSPMD routes intra-slice traffic over ICI and cross-host over
DCN).  Proven end to end by tests/test_multiprocess.py, which drives
RxnGraphTrainer itself across 2 OS processes and asserts loss/param
equality with single-process training.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["initialize", "host_shard", "is_primary", "sync_global_devices",
           "local_mesh_cells", "globalize_group", "globalize_epoch"]

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


def local_mesh_cells(mesh) -> list[tuple[int, int]]:
    """This process's (dp, ep) coordinates on a ('dp','ep') mesh.

    The trainer packs batches ONLY for these cells — the multi-device
    generalization of :func:`host_shard` (each host feeds its own devices,
    nothing else)."""
    pid = jax.process_index()
    return [tuple(idx) for idx, dev in np.ndenumerate(mesh.devices)
            if dev.process_index == pid]


def globalize_group(mesh, cells: dict[tuple[int, int], Any],
                    joint_dp_ep: bool = False):
    """Assemble per-cell host batches into one global jax.Array tree.

    ``cells`` maps THIS process's (dp, ep) mesh coordinates (exactly
    :func:`local_mesh_cells`) to host-side batch pytrees without device
    axes.  Each process device_puts only its own cells; the returned
    leaves are global arrays every process can pass to the shard_map'd
    train/eval steps:

    * default: shape ``[n_dp, n_ep, ...]`` sharded ``P('dp','ep')`` — the
      EP step's batch layout;
    * ``joint_dp_ep``: shape ``[n_dp*n_ep, ...]`` sharded
      ``P(('dp','ep'))`` — the flat-dp step's layout (row-major over the
      mesh, matching ``stack_batches`` order).

    Single-process callers get the same result as ``device_put`` of the
    stacked batch, so the trainer's multihost path is testable on one
    process too.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    n_dp, n_ep = mesh.devices.shape
    if not cells:
        raise ValueError(
            "globalize_group: this process owns no cells of the mesh — "
            "the mesh must cover at least one device of every process "
            "(the trainer guards this at construction)")
    sample = next(iter(cells.values()))
    _, treedef = jax.tree_util.tree_flatten(sample)
    flat = {c: jax.tree_util.tree_leaves(b) for c, b in cells.items()}
    n_leaves = len(jax.tree_util.tree_leaves(sample))
    out = []
    for k in range(n_leaves):
        l0 = np.asarray(flat[next(iter(flat))][k])
        if joint_dp_ep:
            shape = (n_dp * n_ep,) + l0.shape
            sh = NamedSharding(mesh, P(("dp", "ep")))
            arrs = [jax.device_put(np.asarray(leaves[k])[None],
                                   mesh.devices[i, j])
                    for (i, j), leaves in flat.items()]
        else:
            shape = (n_dp, n_ep) + l0.shape
            sh = NamedSharding(mesh, P("dp", "ep"))
            arrs = [jax.device_put(np.asarray(leaves[k])[None, None],
                                   mesh.devices[i, j])
                    for (i, j), leaves in flat.items()]
        out.append(jax.make_array_from_single_device_arrays(shape, sh,
                                                            arrs))
    return jax.tree_util.tree_unflatten(treedef, out)


def globalize_epoch(mesh, stacked, joint_dp_ep: bool = False):
    """Stage a host-global stacked EPOCH (``--device_epoch``) on a
    multi-process mesh.

    ``stacked`` leaves are host-global numpy ``[S, n_dp, n_ep, ...]``
    (default) or ``[S, n_dp*n_ep, ...]`` (``joint_dp_ep`` — the flat-dp
    layout); every process holds the same cache (the reuse_packs cache is
    host-global under multi-process) and device_puts ONLY its local
    cells' columns.  Returns global arrays sharded ``P(None,'dp','ep')``
    / ``P(None,('dp','ep'))`` — the layouts the epoch-scan steps expect.
    A plain ``jax.device_put(stacked, sharding)`` would raise on a
    multi-process mesh (non-addressable devices); this is its
    multi-process equivalent.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    n_dp, n_ep = mesh.devices.shape
    cells = local_mesh_cells(mesh)
    leaves, treedef = jax.tree_util.tree_flatten(stacked)
    out = []
    for leaf in leaves:
        a = np.asarray(leaf)
        if joint_dp_ep:
            sh = NamedSharding(mesh, P(None, ("dp", "ep")))
            arrs = [jax.device_put(a[:, i * n_ep + j:i * n_ep + j + 1],
                                   mesh.devices[i, j]) for (i, j) in cells]
        else:
            sh = NamedSharding(mesh, P(None, "dp", "ep"))
            arrs = [jax.device_put(a[:, i:i + 1, j:j + 1],
                                   mesh.devices[i, j]) for (i, j) in cells]
        out.append(jax.make_array_from_single_device_arrays(a.shape, sh,
                                                            arrs))
    return jax.tree_util.tree_unflatten(treedef, out)
