"""Compute primitives: gather-only XLA ops and Pallas TPU kernels."""

from .segment import (dmpnn_messages, ext_zero_row, gather_nodes,
                      graph_pool_sum, node_incoming_sum)

__all__ = ["dmpnn_messages", "ext_zero_row", "gather_nodes",
           "graph_pool_sum", "node_incoming_sum"]
