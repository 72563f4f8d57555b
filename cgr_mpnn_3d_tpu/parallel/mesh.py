"""Device mesh construction.

The reference is single-GPU with no distribution at all (SURVEY.md §2
parallelism checklist: everything ABSENT).  The TPU framework scales through
a 2-axis logical mesh:

* ``dp`` — data parallelism: each device (group) trains on its own packed
  sub-batch; gradients all-reduce over ICI/DCN.
* ``ep`` — edge partitioning ("context parallelism" for graphs): one batch's
  edge arrays are sharded; boundary bond->atom partial sums are exchanged
  with a psum over ICI (parallel/edge_partition.py).

On multi-host slices, put ``dp`` on the outer (DCN-reaching) axis and ``ep``
inside a host's ICI domain.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "P"]

from jax.sharding import PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_ep: int = 1,
              devices=None) -> Mesh:
    """Build a ('dp', 'ep') mesh over ``devices`` (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_dp is None:
        if n % n_ep != 0:
            raise ValueError(f"{n} devices not divisible by ep={n_ep}")
        n_dp = n // n_ep
    if n_dp * n_ep > n:
        raise ValueError(f"mesh {n_dp}x{n_ep} needs {n_dp * n_ep} devices, "
                         f"have {n}")
    arr = np.asarray(devices[: n_dp * n_ep]).reshape(n_dp, n_ep)
    return Mesh(arr, ("dp", "ep"))
