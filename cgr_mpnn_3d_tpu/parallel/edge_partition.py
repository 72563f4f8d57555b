"""Edge partitioning: one graph batch sharded across chips by its edge axis.

This is the graph analog of sequence/context parallelism (SURVEY.md §5
"long-context" row): the model has no sequence axis, but a large batched
graph's *edge* arrays can exceed one chip.  Each 'ep' shard owns a contiguous
slice of directed-edge *pairs* (keeping e and rev(e) together); node, graph
and parameter state is replicated over 'ep'.

Per D-MPNN layer, each shard computes the partial incoming sums of its local
edges into the (replicated) node axis, and a single ``lax.psum`` over 'ep'
performs the boundary bond->atom exchange over ICI:

    a = psum_ep( partial_k )        # a[u] = sum over ALL edges into u
    t = a[senders_local] - h[rev_local]
    h' = act(t @ W + h0)

Loss ownership: graphs are round-robined over shards so the per-shard losses
sum to the global loss; gradients are uniformly psum'd over ('dp','ep').
Gradient equivalence with the single-device model is asserted in
tests/test_parallel.py.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ..chem.featurize import GraphArrays
from ..models.cgr_mpnn import ACTIVATIONS, CGRMPNNConfig
from ..ops.segment import (gather_nodes, gather_rev, node_partial_sum,
                           graph_pool_sum)
from ..train.trainer import TrainState
from .mesh import P

__all__ = ["EdgeShardedBatch", "shard_edges", "ep_forward",
           "make_ep_train_step"]


class EdgeShardedBatch(NamedTuple):
    """One global graph batch, edge-sharded over ``n_ep`` shards.

    Node/graph arrays are replicated (no leading shard axis is consumed per
    device — every shard carries the full copy); edge arrays have leading
    axis n_ep.  NT/BT include one sentinel-worth of padding semantics: node
    sentinel = NT, local edge sentinel = EK, graph sentinel = BT.
    """
    node_x: np.ndarray          # [n_ep, NT, F]   (identical copies)
    edge_attr: np.ndarray       # [n_ep, EK, Fe]
    senders: np.ndarray         # [n_ep, EK]      global node ids
    receivers: np.ndarray       # [n_ep, EK]      global node ids
    rev: np.ndarray             # [n_ep, EK]      local edge ids
    node_inc: np.ndarray        # [n_ep, NT, D]   local edge ids
    node_out: np.ndarray        # [n_ep, NT, D]   local edge ids
    graph_nodes: np.ndarray     # [n_ep, BK, DN]  global node ids
    graph_of_node: np.ndarray   # [n_ep, NT]      local graph ids (sentinel BK)
    labels: np.ndarray          # [n_ep, BK]
    graph_mask: np.ndarray      # [n_ep, BK]


def shard_edges(graphs: Sequence[GraphArrays], labels: Sequence[float],
                n_ep: int, d: int,
                extra_node_feats: Sequence[np.ndarray] | None = None,
                ek: int | None = None, nt: int | None = None,
                bk: int | None = None, dn: int | None = None
                ) -> EdgeShardedBatch:
    """Build an edge-sharded batch from whole graphs.

    Edge pairs are dealt contiguously but balanced across shards; a single
    graph's edges may span every shard (that is the point).  Graphs are
    round-robined to shards for loss ownership.
    """
    n_feat = graphs[0].node_feats.shape[1]
    if extra_node_feats is not None:
        n_feat += extra_node_feats[0].shape[1]
    e_feat = graphs[0].edge_feats.shape[1]

    # global node numbering
    node_off = np.cumsum([0] + [g.num_nodes for g in graphs])
    NT = int(node_off[-1])
    total_pairs = sum(g.num_edges for g in graphs) // 2
    pairs_per = int(np.ceil(total_pairs / n_ep))
    EK = ek or 2 * pairs_per
    n_graphs = len(graphs)
    BK = bk or int(np.ceil(n_graphs / n_ep))
    DN = dn or max(g.num_nodes for g in graphs)
    if nt:
        NT = nt

    node_x = np.zeros((NT, n_feat), np.float32)
    edge_attr = np.zeros((n_ep, EK, e_feat), np.float32)
    senders = np.full((n_ep, EK), NT, np.int32)
    receivers = np.full((n_ep, EK), NT, np.int32)
    rev = np.full((n_ep, EK), EK, np.int32)
    node_inc = np.full((n_ep, NT, d), EK, np.int32)
    node_out = np.full((n_ep, NT, d), EK, np.int32)
    graph_nodes = np.full((n_ep, BK, DN), NT, np.int32)
    graph_of_node = np.full((n_ep, NT), BK, np.int32)
    labels_out = np.zeros((n_ep, BK), np.float32)
    graph_mask = np.zeros((n_ep, BK), np.float32)

    fill = np.zeros(n_ep, np.int64)          # edges used per shard
    inc_fill = np.zeros((n_ep, NT), np.int32)
    shard_cursor = 0

    for gi, g in enumerate(graphs):
        off = node_off[gi]
        x = g.node_feats
        if extra_node_feats is not None:
            x = np.concatenate(
                [x, np.asarray(extra_node_feats[gi], np.float32)], axis=1)
        node_x[off:off + g.num_nodes] = x

        # loss ownership
        k_own = gi % n_ep
        slot = np.count_nonzero(graph_mask[k_own])
        if slot >= BK:
            raise ValueError("graph slots exhausted; raise bk")
        graph_nodes[k_own, slot, :g.num_nodes] = np.arange(
            off, off + g.num_nodes, dtype=np.int32)
        graph_of_node[k_own, off:off + g.num_nodes] = slot
        labels_out[k_own, slot] = labels[gi]
        graph_mask[k_own, slot] = 1.0

        # deal edge pairs to shards (least-loaded first fit)
        for p in range(g.num_edges // 2):
            e0, e1 = 2 * p, 2 * p + 1
            k = int(np.argmin(fill))
            if fill[k] + 2 > EK:
                raise ValueError("edge slots exhausted; raise ek")
            base = int(fill[k])
            for j, e in enumerate((e0, e1)):
                s = off + g.senders[e]
                r = off + g.receivers[e]
                le = base + j
                edge_attr[k, le] = g.edge_feats[e]
                senders[k, le] = s
                receivers[k, le] = r
                c = inc_fill[k, r]
                if c >= d:
                    raise ValueError("in-degree exceeds ELL width d")
                node_inc[k, r, c] = le
                inc_fill[k, r] = c + 1
            rev[k, base] = base + 1
            rev[k, base + 1] = base
            fill[k] += 2
            shard_cursor += 1

    # node_out[k, n] = out-edges of n on shard k = rev(in-edges of n)
    for k in range(n_ep):
        valid = node_inc[k] < EK
        node_out[k][valid] = rev[k][node_inc[k][valid]]

    return EdgeShardedBatch(
        np.broadcast_to(node_x, (n_ep,) + node_x.shape).copy(),
        edge_attr, senders, receivers, rev, node_inc, node_out,
        graph_nodes, graph_of_node, labels_out, graph_mask)


def _linear(p, x, dtype):
    return (jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + p["b"].astype(jnp.float32))


def ep_forward(params: dict, b: EdgeShardedBatch, cfg: CGRMPNNConfig,
               *, axis: str = "ep", train: bool = False,
               rng: jax.Array | None = None
               ) -> tuple[jax.Array, jax.Array]:
    """Per-shard forward (call inside shard_map over ``axis``).

    ``b`` leaves are the shard-local slices (no leading shard axis).
    Returns (per-shard partial sum loss_sse, per-shard predictions [BK]).
    Dropout masks are drawn per shard (each shard owns distinct edges, so
    independent masks are exactly equivalent to the single-device draw).
    """
    if cfg.aggr != "add":
        raise ValueError(
            f"edge-partitioned forward implements aggr='add' only, got "
            f"{cfg.aggr!r} (mean normalization would need a global-degree "
            f"exchange; use the single-device model)")
    act = ACTIVATIONS[cfg.activation]
    dt = cfg.compute_dtype
    if train and rng is not None:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        drop_keys = list(jax.random.split(rng, cfg.depth))
    else:
        drop_keys = [None] * cfg.depth

    x = b.node_x                       # [NT, F] replicated copy
    x_src = gather_nodes(x, b.senders, b.node_out)
    h0 = act(_linear(params["edge_init"],
                     jnp.concatenate([x_src, b.edge_attr], 1), dt))
    h = h0
    for l in range(cfg.depth):
        partial = node_partial_sum(h, b.node_inc, b.receivers)   # [NT, H]
        a = jax.lax.psum(partial, axis)      # boundary exchange over ICI
        t = gather_nodes(a, b.senders, b.node_out) - gather_rev(h, b.rev)
        h_new = _linear(params["convs"][l], t, dt)
        if cfg.use_learnable_skip:
            h = h_new + params["skip_weights"][l] * h0
        else:
            h = h_new + h0
        h = act(h)
        if drop_keys[l] is not None and cfg.dropout_ps[l] > 0.0:
            keep = 1.0 - cfg.dropout_ps[l]
            mask = jax.random.bernoulli(drop_keys[l], keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)

    partial = node_partial_sum(h, b.node_inc, b.receivers)
    s = jax.lax.psum(partial, axis)
    hn = act(_linear(params["edge_to_node"], jnp.concatenate([x, s], 1), dt))
    pooled = graph_pool_sum(hn, b.graph_nodes, b.graph_of_node)
    preds = _linear(params["ffn"], pooled, dt)[:, 0]
    err = (preds - b.labels) * b.graph_mask
    return jnp.sum(err * err), preds


def make_ep_train_step(optimizer: optax.GradientTransformation,
                       cfg: CGRMPNNConfig, mesh: Mesh):
    """Combined dp x ep train step over stacked EdgeShardedBatches.

    Batch leaves are stacked [n_dp, n_ep, ...]: axis 0 sharded over 'dp',
    axis 1 over 'ep'.
    """

    def per_device(state: TrainState, batch: EdgeShardedBatch):
        local = jax.tree_util.tree_map(lambda v: v[0, 0], batch)
        rng, sub = jax.random.split(state.rng)
        sub = jax.random.fold_in(sub, jax.lax.axis_index("dp"))

        def loss_fn(params):
            sse, _ = ep_forward(params, local, cfg, axis="ep",
                                train=True, rng=sub)
            return sse

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        loss = jax.lax.psum(loss, ("dp", "ep"))
        grads = jax.lax.psum(grads, ("dp", "ep"))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, rng), loss

    batch_spec = jax.tree_util.tree_map(
        lambda _: P("dp", "ep"), EdgeShardedBatch(*[0] * 11))
    smapped = jax.shard_map(per_device, mesh=mesh,
                            in_specs=(P(), batch_spec),
                            out_specs=(P(), P()), check_vma=False)
    return jax.jit(smapped, donate_argnums=(0,))
