"""Pallas-backed variants of the message-passing ops, with custom VJPs whose
backward passes are the same one-hot SpMM kernel with transposed index
arrays (see ops/pallas_ops.py for the mapping table)."""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .pallas_ops import onehot_spmm

__all__ = ["PallasImpl", "dmpnn_messages_p", "node_incoming_sum_p",
           "gather_nodes_p", "graph_pool_sum_p"]


@dataclass(frozen=True)
class PallasImpl:
    """Static kernel config (hashable: part of the jit key)."""
    p: int                      # packs per batch
    mat_dtype: Any = jnp.bfloat16
    interpret: bool = False

    def run(self, idx, sign, src):
        return onehot_spmm(idx, sign, src, self.p, self.mat_dtype,
                           self.interpret)


# -- D-MPNN messages: t[e] = sum_in(send(e)) - h[rev(e)] --------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def dmpnn_messages_p(impl, h, edge_nbr, rev, edge_nbr_rev):
    return impl.run(edge_nbr, rev, h)


def _dm_fwd(impl, h, edge_nbr, rev, edge_nbr_rev):
    return impl.run(edge_nbr, rev, h), (edge_nbr_rev, rev)


def _dm_bwd(impl, res, g):
    edge_nbr_rev, rev = res
    return impl.run(edge_nbr_rev, rev, g), None, None, None


dmpnn_messages_p.defvjp(_dm_fwd, _dm_bwd)


# -- incoming sum s[u] = sum_{recv(e)=u} h[e] -------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def node_incoming_sum_p(impl, h, node_inc, receivers):
    return impl.run(node_inc, None, h)


def _nis_fwd(impl, h, node_inc, receivers):
    return impl.run(node_inc, None, h), (receivers,)


def _nis_bwd(impl, res, g):
    (receivers,) = res
    return impl.run(receivers[:, None], None, g), None, None


node_incoming_sum_p.defvjp(_nis_fwd, _nis_bwd)


# -- x[senders] -------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gather_nodes_p(impl, x, senders, node_out):
    return impl.run(senders[:, None], None, x)


def _gn_fwd(impl, x, senders, node_out):
    return impl.run(senders[:, None], None, x), (node_out,)


def _gn_bwd(impl, res, g):
    (node_out,) = res
    return impl.run(node_out, None, g), None, None


gather_nodes_p.defvjp(_gn_fwd, _gn_bwd)


# -- sum pooling ------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def graph_pool_sum_p(impl, hn, graph_nodes, graph_of_node):
    return impl.run(graph_nodes, None, hn)


def _gp_fwd(impl, hn, graph_nodes, graph_of_node):
    return impl.run(graph_nodes, None, hn), (graph_of_node,)


def _gp_bwd(impl, res, g):
    (graph_of_node,) = res
    return impl.run(graph_of_node[:, None], None, g), None, None


graph_pool_sum_p.defvjp(_gp_fwd, _gp_bwd)
