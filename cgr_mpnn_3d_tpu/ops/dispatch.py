"""Generic custom-VJP wrapper for the transposed one-hot SpMM kernel.

One differentiable op covers every gather in the model: the forward is an
:func:`onehot_spmm_t` with the op's forward index rows, the backward is the
*same kernel* with the transpose index rows (both precomputed once per step
by :func:`build_model_indices`).

    op                  fwd rows (sum±sign)         bwd rows
    messages            edge_nbr + rev              edge_nbr_rev + rev
    incoming sum        node_inc                    receivers
    x[senders]          senders                     node_out
    sum pooling         graph_nodes                 graph_of_node
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pallas_ops import build_idx_t, onehot_spmm_t

__all__ = ["SpmmMeta", "spmm_t", "ModelIndices", "build_model_indices"]


class SpmmMeta(NamedTuple):
    """Static kernel parameters (hashable; nondiff argument)."""
    d_nbr: int
    has_sign: bool
    mat_dtype: object = jnp.bfloat16
    out_dtype: object = jnp.float32
    interpret: bool = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def spmm_t(p: int, meta_fwd: SpmmMeta, meta_bwd: SpmmMeta,
           src, idx_fwd_t, idx_bwd_t):
    return onehot_spmm_t(idx_fwd_t, src, p, meta_fwd.d_nbr,
                         meta_fwd.has_sign, meta_fwd.mat_dtype,
                         meta_fwd.out_dtype, meta_fwd.interpret)


def _spmm_fwd(p, meta_fwd, meta_bwd, src, idx_fwd_t, idx_bwd_t):
    out = spmm_t(p, meta_fwd, meta_bwd, src, idx_fwd_t, idx_bwd_t)
    # zero-size dtype token (residuals must be JAX types)
    return out, (idx_bwd_t, jnp.zeros((0,), src.dtype))


def _spmm_bwd(p, meta_fwd, meta_bwd, res, g):
    idx_bwd_t, dtype_token = res
    d_src = onehot_spmm_t(idx_bwd_t, g, p, meta_bwd.d_nbr,
                          meta_bwd.has_sign, meta_bwd.mat_dtype,
                          meta_bwd.out_dtype, meta_bwd.interpret)
    return d_src.astype(dtype_token.dtype), None, None


spmm_t.defvjp(_spmm_fwd, _spmm_bwd)


class ModelIndices(NamedTuple):
    """Transposed index tensors for one packed batch (built once per step)."""
    msg_fwd: jax.Array       # [p*Dp, TE]  edge_nbr + rev
    msg_bwd: jax.Array       # [p*Dp, TE]  edge_nbr_rev + rev
    inc_fwd: jax.Array       # [p*Dp, TN]  node_inc
    inc_bwd: jax.Array       # [p*8,  TE]  receivers
    gather_fwd: jax.Array    # [p*8,  TE]  senders
    gather_bwd: jax.Array    # [p*Dp, TN]  node_out
    pool_fwd: jax.Array      # [p*DNp, TB] graph_nodes
    pool_bwd: jax.Array      # [p*8,  TN]  graph_of_node


def build_model_indices(batch, p: int) -> ModelIndices:
    return ModelIndices(
        msg_fwd=build_idx_t(batch.edge_nbr, batch.rev, p),
        msg_bwd=build_idx_t(batch.edge_nbr_rev, batch.rev, p),
        inc_fwd=build_idx_t(batch.node_inc, None, p),
        inc_bwd=build_idx_t(batch.receivers[:, None], None, p),
        gather_fwd=build_idx_t(batch.senders[:, None], None, p),
        gather_bwd=build_idx_t(batch.node_out, None, p),
        pool_fwd=build_idx_t(batch.graph_nodes, None, p),
        pool_bwd=build_idx_t(batch.graph_of_node[:, None], None, p),
    )
