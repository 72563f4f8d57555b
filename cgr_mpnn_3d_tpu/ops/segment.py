"""Gather-only message-passing primitives (XLA path) with custom VJPs.

The reference's hot loop is a CUDA scatter-add (PyG ``propagate`` with
aggr='add', GNN.py:134 via torch_scatter).  Scatters are the worst-case op
for a TPU — XLA lowers them to serialized dynamic-update-slices.  This module
removes them entirely: with the packer's precomputed ELL index arrays
(data/batch.py), every forward op is a batched row gather, and — because the
packer also materializes each gather's *transpose* index array — every
backward pass is a gather too:

    op                              forward gather      backward gather
    gather_nodes   x[senders]       senders             node_out[n, :]
    dmpnn_messages sum-in - rev     edge_nbr[e, :]      edge_nbr_rev[e, :]
    node_incoming_sum               node_inc[n, :]      receivers
    graph_pool_sum                  graph_nodes[g, :]   graph_of_node

Sentinel convention: indices equal to the source array's row count select an
appended all-zero row, so padding contributes exactly zero with no masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gather_nodes", "dmpnn_messages", "node_incoming_sum",
           "node_partial_sum", "graph_pool_sum", "gather_rev",
           "ext_zero_row"]


def ext_zero_row(h: jax.Array) -> jax.Array:
    """Append one all-zero row: the sentinel target."""
    return jnp.concatenate([h, jnp.zeros((1,) + h.shape[1:], h.dtype)], axis=0)


def _take(h_ext: jax.Array, idx: jax.Array) -> jax.Array:
    # rows are guaranteed in-range by construction (sentinel = num_rows)
    return jnp.take(h_ext, idx, axis=0, indices_are_sorted=False,
                    unique_indices=False, mode="clip")


# ---------------------------------------------------------------------------
# x[senders]  (edge_init gather, GNN.py:85-86 ``x[row]``)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gather_nodes(x, senders, node_out):
    return _take(ext_zero_row(x), senders)


def _gather_nodes_fwd(x, senders, node_out):
    return gather_nodes(x, senders, node_out), (node_out,)


def _gather_nodes_bwd(res, g):
    (node_out,) = res
    # dL/dx[n] = sum over out-edges of n of g  (node_out has one row per node)
    dx = _take(ext_zero_row(g), node_out).sum(axis=1)
    return dx, None, None


gather_nodes.defvjp(_gather_nodes_fwd, _gather_nodes_bwd)


# ---------------------------------------------------------------------------
# D-MPNN message construction (GNN.py:131-141):
#   t[e] = sum_{e': recv(e')=send(e)} h[e'] / norm[e]  -  h[rev(e)]
# i.e. a_message[src] - rev_message, fused.  ``norm`` is 1 for aggr='add' or
# the sender's in-degree for aggr='mean'.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def dmpnn_messages(h, edge_nbr, rev, edge_nbr_rev, norm):
    he = ext_zero_row(h)
    a_src = _take(he, edge_nbr).sum(axis=1)
    return a_src * norm[:, None] - _take(he, rev)


def _dmpnn_messages_fwd(h, edge_nbr, rev, edge_nbr_rev, norm):
    out = dmpnn_messages(h, edge_nbr, rev, edge_nbr_rev, norm)
    return out, (edge_nbr, rev, edge_nbr_rev, norm)


def _dmpnn_messages_bwd(res, g):
    edge_nbr, rev, edge_nbr_rev, norm = res
    gn = g * norm[:, None]
    ge = ext_zero_row(gn)
    # dL/dh[f] = sum_{e in out(recv(f))} g[e]*norm[e]  -  g[rev(f)]
    dh = _take(ge, edge_nbr_rev).sum(axis=1) - _take(ext_zero_row(g), rev)
    return dh, None, None, None, None


dmpnn_messages.defvjp(_dmpnn_messages_fwd, _dmpnn_messages_bwd)


# ---------------------------------------------------------------------------
# edge -> node incoming sum (readout ``s``, GNN.py:105 conv reuse: the reused
# conv's a_message is an unparameterized segment sum)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def node_incoming_sum(h, node_inc, receivers):
    return _take(ext_zero_row(h), node_inc).sum(axis=1)


def _nis_fwd(h, node_inc, receivers):
    return node_incoming_sum(h, node_inc, receivers), (receivers,)


def _nis_bwd(res, g):
    (receivers,) = res
    # dL/dh[e] = g[recv(e)]
    return _take(ext_zero_row(g), receivers), None, None


node_incoming_sum.defvjp(_nis_fwd, _nis_bwd)


# ---------------------------------------------------------------------------
# reverse-edge lookup h[rev]: rev is an involution on real edges, so the
# adjoint of this gather is the same gather (no scatter in bwd).
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gather_rev(h, rev):
    return _take(ext_zero_row(h), rev)


def _gather_rev_fwd(h, rev):
    return gather_rev(h, rev), (rev,)


def _gather_rev_bwd(res, g):
    (rev,) = res
    return _take(ext_zero_row(g), rev), None


gather_rev.defvjp(_gather_rev_fwd, _gather_rev_bwd)


# ---------------------------------------------------------------------------
# edge-partitioned partial incoming sum (parallel/edge_partition.py): same
# math as node_incoming_sum but over a *shard-local* edge array; the caller
# lax.psum's the partials over the 'ep' mesh axis (the boundary exchange).
# Distinct op because the backward gather uses shard-local receiver ids.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def node_partial_sum(h_local, node_inc_local, receivers_local):
    return _take(ext_zero_row(h_local), node_inc_local).sum(axis=1)


def _nps_fwd(h_local, node_inc_local, receivers_local):
    out = node_partial_sum(h_local, node_inc_local, receivers_local)
    return out, (receivers_local,)


def _nps_bwd(res, g):
    (receivers_local,) = res
    # dL/dh_local[e] = g[recv(e)]  (g covers all nodes; recv ids are global
    # node ids, sentinel = num_nodes)
    return _take(ext_zero_row(g), receivers_local), None, None


node_partial_sum.defvjp(_nps_fwd, _nps_bwd)


# ---------------------------------------------------------------------------
# node -> graph sum pooling (global_add_pool, GNN.py:110)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def graph_pool_sum(hn, graph_nodes, graph_of_node):
    return _take(ext_zero_row(hn), graph_nodes).sum(axis=1)


def _pool_fwd(hn, graph_nodes, graph_of_node):
    return graph_pool_sum(hn, graph_nodes, graph_of_node), (graph_of_node,)


def _pool_bwd(res, g):
    (graph_of_node,) = res
    return _take(ext_zero_row(g), graph_of_node), None, None


graph_pool_sum.defvjp(_pool_fwd, _pool_bwd)
