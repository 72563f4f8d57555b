"""cgr_mpnn_3d_tpu — a TPU-native framework for CGR reaction-graph MPNNs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tobjec/CGR-MPNN-3D (reference mounted at /root/reference): condensed-graph-of-
reaction featurization, directed-bond message passing, MACE 3D descriptor
fusion, training/eval/inference CLIs, and multi-chip scaling via
``jax.sharding`` meshes (data parallel + edge partitioning).

Design pillars (see SURVEY.md §7):
* static-shape block-dense graph packing — graphs are packed into fixed-size
  tiles with pack-local indices so message passing maps onto MXU matmuls;
* gather-only compute path — all scatter adjoints are re-expressed as gathers
  via precomputed reverse-index arrays (no scatters in fwd or bwd);
* Pallas kernels for the hot per-tile one-hot SpMM;
* shard_map data parallelism + edge-partitioned boundary exchange over ICI.
"""

__version__ = "0.1.0"
