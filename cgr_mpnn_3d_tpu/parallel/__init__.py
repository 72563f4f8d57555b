"""Parallelism: device meshes, data parallelism, edge partitioning."""

from .data_parallel import (make_dp_eval_step, make_dp_train_step,
                            shard_stacked_batch, stack_batches)
from .edge_partition import (EdgeShardedBatch, ep_forward, make_ep_eval_step,
                             make_ep_train_step, shard_edges)
from .ep_loader import EPLoader, empty_ep_batch_like
from .mesh import P, make_mesh

__all__ = ["make_dp_eval_step", "make_dp_train_step", "shard_stacked_batch",
           "stack_batches", "EdgeShardedBatch", "ep_forward",
           "make_ep_train_step", "make_ep_eval_step", "shard_edges",
           "EPLoader", "empty_ep_batch_like", "P", "make_mesh"]
