"""Parallelism: device meshes, data parallelism, edge partitioning."""

from .data_parallel import (make_dp_epoch_scan, make_dp_eval_step,
                            make_dp_train_step,
                            shard_stacked_batch, stack_batches)
from .edge_partition import (EdgeShardedBatch, EPOverflow, ep_forward,
                             make_ep_eval_step, make_ep_train_step,
                             shard_edges)
from .ep_loader import EPLoader, EPPackLoader, empty_ep_batch_like
from .ep_pack import (EPPackedBatch, EPPackSpec, empty_ep_pack_batch,
                      ep_pack_forward, make_ep_pack_eval_step,
                      make_ep_pack_train_step, pack_shard_edges)
from .mesh import P, make_mesh

__all__ = ["make_dp_epoch_scan", "make_dp_eval_step",
           "make_dp_train_step", "shard_stacked_batch",
           "stack_batches", "EdgeShardedBatch", "EPOverflow", "ep_forward",
           "make_ep_train_step", "make_ep_eval_step", "shard_edges",
           "EPLoader", "EPPackLoader", "empty_ep_batch_like",
           "EPPackedBatch", "EPPackSpec", "empty_ep_pack_batch",
           "ep_pack_forward", "make_ep_pack_eval_step",
           "make_ep_pack_train_step", "pack_shard_edges", "P", "make_mesh"]
