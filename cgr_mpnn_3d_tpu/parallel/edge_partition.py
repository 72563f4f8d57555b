"""Edge partitioning: one graph batch sharded across chips by its edge axis.

This is the graph analog of sequence/context parallelism (SURVEY.md §5
"long-context" row): the model has no sequence axis, but a large batched
graph's edge arrays can exceed one chip.  Design (round 2 — replaces the
round-1 replicated-node psum baseline):

* **Node ownership.**  The global node axis is split into contiguous blocks:
  shard k owns nodes [k*NK, (k+1)*NK).  Node features and node state live
  ONLY on their owner — per-shard node memory is NT/n_ep + halo, never NT.
* **Edge-pair assignment.**  Directed-edge pairs (e, rev e) stay together on
  the shard owning the even edge's source, so ``h[rev e]`` is always local.
  A single graph's pairs may span every shard (that is the point).
* **One extended index space per shard.**  Local positions = owned block
  [0, NK) ++ boundary slots [NK, NK + n_ep*S) laid out per peer shard
  ([j, i] = i-th boundary node shared with shard j).  The same space serves
  as (a) the scatter target for partial incoming sums (slots = partials to
  push to owners), (b) the halo for completed sums pulled back, and (c) the
  host-packed x halo — one set of index arrays drives everything.
* **Ragged boundary exchange.**  Per D-MPNN layer, two padded
  ``lax.all_to_all`` hops over the 'ep' (ICI) axis move ONLY boundary rows:

      partial = segment-sum(h) over [NK + n_ep*S]        (local)
      push:  all_to_all(partial[NK:])  ->  owners add into A_own
      pull:  all_to_all(A_own[recv_idx]) ->  halo of completed rows
      t = A_ext[src_idx] - h[rev]                        (local gathers)

  Comm volume per layer = 2 * n_ep * S * H rows where S tracks the max
  per-peer boundary-node count — proportional to boundary size, NOT to NT.
  (The reference has no distributed path at all; BASELINE.json's north star
  mandates this axis.  Round-3 candidate: overlap the push with the conv
  matmul via Pallas ``make_async_remote_copy`` double buffering.)
* **Loss.**  Graphs may straddle shards: pooling is a per-shard partial sum
  over owned nodes, combined with one psum of the tiny [B, H_pool->1]
  tensor.  The ffn bias enters pre-psum as b/n_ep so per-shard autodiff +
  gradient psum is exact (no replicated-region double counting).

Gradient equivalence with the single-device model is asserted in
tests/test_parallel.py, including a 480-atom graph spanning all shards.
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
from ..ops.segment import gather_nodes, gather_rev, node_partial_sum
from ..train.trainer import TrainState
from .mesh import P

__all__ = ["EPOverflow", "EdgeShardedBatch", "shard_edges",
           "ep_forward", "make_ep_train_step", "make_ep_eval_step"]


class EPOverflow(ValueError):
    """A batch exceeded pinned padded sizes — grow the pins and retry (the
    only ValueError subclass the EP loaders' pin-growth loop catches, so
    real input errors surface immediately; advisor r2 finding)."""


class EdgeShardedBatch(NamedTuple):
    """One global graph batch, edge-sharded over ``n_ep`` shards.

    Leading axis = n_ep (consumed by shard_map).  Sizes per shard:
    NK owned nodes, T = n_ep*S boundary slots, NKH = NK + T extended
    positions, EK edge slots, B global graphs.  Sentinels follow
    ops/segment.py: an index equal to the gathered array's row count
    selects an appended zero row.
    """
    node_x: np.ndarray        # [n_ep, NKH, F] owned x ++ host-packed halo x
    edge_attr: np.ndarray     # [n_ep, EK, Fe]
    src_idx: np.ndarray       # [n_ep, EK]      ext position of src (sent NKH)
    rev: np.ndarray           # [n_ep, EK]      local edge ids (sentinel EK)
    dst_part: np.ndarray      # [n_ep, EK]      ext position of dst (sent NKH)
    part_inc: np.ndarray      # [n_ep, NKH, D]  in-edges per ext pos (sent EK)
    ext_out: np.ndarray       # [n_ep, NKH, D2] out-edges per ext pos (sent EK)
    recv_idx: np.ndarray      # [n_ep, T]       owned pos of each boundary
                              #                 slot this shard SERVES (sent NK)
    own_recv_inc: np.ndarray  # [n_ep, NK, DR]  serving slots per owned node
                              #                 (sentinel T)
    graph_nodes: np.ndarray   # [n_ep, B, DN]   owned node pos per graph
                              #                 (sentinel NK)
    node_graph: np.ndarray    # [n_ep, NK]      graph of owned node (sent B)
    inv_deg_own: np.ndarray   # [n_ep, NK]      1/in-degree of owned nodes
                              #                 (0 for isolated/pad; mean aggr)
    labels: np.ndarray        # [n_ep, B]       identical copies
    graph_mask: np.ndarray    # [n_ep, B]


def _r8(v: int, lo: int = 8) -> int:
    return max(lo, int(-(-v // 8)) * 8)


def _dfs_order(nn: int, senders: np.ndarray,
               receivers: np.ndarray) -> np.ndarray:
    """DFS visit order (old id per new position) — contiguous-block node
    ownership needs *locality in the id space*; DFS keeps subtrees
    contiguous so a block boundary cuts O(depth + crossing chords) edges
    instead of O(E)."""
    deg = np.bincount(senders, minlength=nn)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    adj = receivers[np.argsort(senders, kind="stable")]
    visited = np.zeros(nn, bool)
    out = np.empty(nn, np.int64)
    w = 0
    for seed in range(nn):
        if visited[seed]:
            continue
        visited[seed] = True
        stack = [seed]
        while stack:
            u = stack.pop()
            out[w] = u
            w += 1
            for v in adj[indptr[u]:indptr[u + 1]][::-1]:
                if not visited[v]:
                    visited[v] = True
                    stack.append(int(v))
    return out


def _relabel_large(graphs, extra_node_feats, threshold: int):
    """DFS-relabel nodes of graphs above ``threshold`` nodes (edge order —
    and with it the pair/rev layout — is preserved; predictions are
    invariant to node relabeling)."""
    gs = list(graphs)
    ex = list(extra_node_feats) if extra_node_feats is not None else None
    for i, g in enumerate(gs):
        if g.num_nodes < threshold or g.num_edges == 0:
            continue
        old_of_new = _dfs_order(g.num_nodes, g.senders, g.receivers)
        new_of_old = np.empty_like(old_of_new)
        new_of_old[old_of_new] = np.arange(g.num_nodes)
        gs[i] = GraphArrays(
            node_feats=g.node_feats[old_of_new],
            edge_feats=g.edge_feats,
            senders=new_of_old[g.senders].astype(np.int32),
            receivers=new_of_old[g.receivers].astype(np.int32),
            rev_edge_index=g.rev_edge_index)
        if ex is not None:
            ex[i] = np.asarray(ex[i])[old_of_new]
    return gs, ex


def _ell_pack(rows: np.ndarray, vals: np.ndarray, n_rows: int, width: int,
              sentinel: int, what: str) -> np.ndarray:
    """Vectorized ELL packing: out[rows[m], rank_within_row(m)] = vals[m]."""
    out = np.full((n_rows, width), sentinel, np.int32)
    if len(rows) == 0:
        return out
    order = np.argsort(rows, kind="stable")
    r, v = rows[order], vals[order]
    counts = np.bincount(r, minlength=n_rows)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(r)) - np.repeat(starts, counts)
    if counts.max(initial=0) > width:
        raise EPOverflow(f"{what}: ELL width {width} < max degree "
                          f"{int(counts.max())}; raise it")
    out[r, rank] = v
    return out


def shard_edges(graphs: Sequence[GraphArrays], labels: Sequence[float],
                n_ep: int, d: int | None = None,
                extra_node_feats: Sequence[np.ndarray] | None = None,
                ek: int | None = None, nk: int | None = None,
                s_max: int | None = None, dn: int | None = None,
                d_out: int | None = None, d_recv: int | None = None
                ) -> EdgeShardedBatch:
    """Build an edge-sharded batch from whole graphs (vectorized host code:
    no per-edge Python — a ~100k-edge batch shards in tens of ms, see
    tests/test_parallel.py::test_shard_edges_vectorized_speed).

    Optional size overrides (ek/nk/s_max/dn/d/d_out/d_recv) pin the padded
    shapes so different batches share one jit compilation.
    """
    n_graphs = len(graphs)
    # locality: giant graphs get a DFS node relabeling so contiguous
    # ownership blocks cut few edges (small graphs are contiguous already)
    graphs, extra_node_feats = _relabel_large(graphs, extra_node_feats,
                                              threshold=64)
    # ---- disjoint union (bulk concatenates) -------------------------------
    n_nodes = np.asarray([g.num_nodes for g in graphs], np.int64)
    n_edges = np.asarray([g.num_edges for g in graphs], np.int64)
    if (n_edges % 2).any():
        raise ValueError("directed-edge counts must be even (pair layout)")
    node_off = np.concatenate([[0], np.cumsum(n_nodes)])
    NT = int(node_off[-1])
    x = np.concatenate([g.node_feats for g in graphs], axis=0)
    if extra_node_feats is not None:
        x = np.concatenate(
            [x, np.concatenate([np.asarray(a, np.float32)
                                for a in extra_node_feats], axis=0)], axis=1)
    e_attr = np.concatenate([g.edge_feats for g in graphs], axis=0)
    edge_off = np.repeat(node_off[:-1], n_edges)
    send_g = np.concatenate([g.senders for g in graphs]).astype(np.int64)
    send_g += edge_off
    recv_g = np.concatenate([g.receivers for g in graphs]).astype(np.int64)
    recv_g += edge_off
    graph_of = np.repeat(np.arange(n_graphs, dtype=np.int64), n_nodes)
    E = len(send_g)

    # ---- ownership and pair assignment ------------------------------------
    # NK is the per-shard array CAPACITY (pinnable for static shapes); the
    # ownership block size tracks the ACTUAL node count so a small batch
    # under a large pin still spreads evenly over all shards — ownership
    # geometry (and with it every other natural size) is independent of
    # the pins, which keeps pin-growth monotone and convergent.
    NK = nk or _r8(int(np.ceil(NT / n_ep)))
    block = max(1, int(np.ceil(NT / n_ep)))
    if block > NK:
        raise EPOverflow(f"nk={NK} too small for {NT} nodes / {n_ep} shards")
    owner = lambda n: np.minimum(n // block, n_ep - 1)
    pair_src = send_g[0::2]                    # even edge's source
    pair_shard = owner(pair_src)               # [E/2]

    # ---- boundary sets: unique (shard k, remote node v) --------------------
    pair_dst = recv_g[0::2]
    b_mask = owner(pair_dst) != pair_shard
    bk = pair_shard[b_mask]                    # shard that references
    bv = pair_dst[b_mask]                      # remote node referenced
    kv = np.unique(bk * np.int64(NT + 1) + bv)
    u_k, u_v = kv // (NT + 1), kv % (NT + 1)
    u_j = owner(u_v)                           # owner of each boundary node
    # slot index within (k, j): entries already sorted by (k, v); group by
    # (k, j) — v values for one (k, j) group are contiguous ascending
    kj = u_k * n_ep + u_j
    order = np.argsort(kj, kind="stable")
    kj_s, v_s, k_s, j_s = kj[order], u_v[order], u_k[order], u_j[order]
    grp_counts = np.bincount(kj_s, minlength=n_ep * n_ep)
    starts = np.concatenate([[0], np.cumsum(grp_counts)[:-1]])
    slot = np.arange(len(kj_s)) - np.repeat(starts, grp_counts) \
        if len(kj_s) else np.zeros(0, np.int64)
    S = s_max or _r8(int(grp_counts.max(initial=0)))
    if grp_counts.max(initial=0) > S:
        raise EPOverflow(f"s_max={S} < max boundary set "
                         f"{int(grp_counts.max())}")
    T = n_ep * S
    NKH = NK + T

    # ext-position lookup: lut[k, v] = NK + j*S + slot for boundary (k, v)
    lut = np.full((n_ep, NT), -1, np.int64)
    if len(v_s):
        lut[k_s, v_s] = NK + j_s * S + slot

    def ext_pos(k_arr, n_arr):
        """ext position of global node n as seen from shard k."""
        own = owner(n_arr)
        local = n_arr - k_arr * block
        bpos = lut[k_arr, n_arr]
        return np.where(own == k_arr, local, bpos)

    # ---- per-shard edge layout --------------------------------------------
    pair_order = np.argsort(pair_shard, kind="stable")
    pair_counts = np.bincount(pair_shard, minlength=n_ep)
    EK = ek or _r8(2 * int(pair_counts.max(initial=0)), lo=8)
    if 2 * pair_counts.max(initial=0) > EK:
        raise EPOverflow(f"ek={EK} < max shard edges "
                         f"{2 * int(pair_counts.max())}")
    p_starts = np.concatenate([[0], np.cumsum(pair_counts)[:-1]])
    p_rank = np.arange(len(pair_order)) - np.repeat(p_starts, pair_counts)
    # local edge slots: pair rank r -> slots (2r, 2r+1)
    shard_of_pair_sorted = pair_shard[pair_order]
    eids = np.stack([2 * pair_order, 2 * pair_order + 1], 1).reshape(-1)
    e_shard = np.repeat(shard_of_pair_sorted, 2)
    e_slot = np.stack([2 * p_rank, 2 * p_rank + 1], 1).reshape(-1)

    Fe = e_attr.shape[1]
    F = x.shape[1]
    edge_attr = np.zeros((n_ep, EK, Fe), e_attr.dtype)
    src_idx = np.full((n_ep, EK), NKH, np.int32)
    dst_part = np.full((n_ep, EK), NKH, np.int32)
    rev = np.full((n_ep, EK), EK, np.int32)
    edge_attr[e_shard, e_slot] = e_attr[eids]
    src_idx[e_shard, e_slot] = ext_pos(e_shard, send_g[eids])
    dst_part[e_shard, e_slot] = ext_pos(e_shard, recv_g[eids])
    rev[e_shard, e_slot] = e_slot ^ 1          # pairs stay adjacent

    # ---- node features: owned block ++ halo --------------------------------
    node_x = np.zeros((n_ep, NKH, F), x.dtype)
    for k in range(n_ep):                       # n_ep iterations, bulk rows
        lo = k * block
        hi = min((k + 1) * block, NT) if k < n_ep - 1 else NT
        if hi > lo:
            node_x[k, :hi - lo] = x[lo:hi]
    if len(v_s):
        node_x[k_s, NK + j_s * S + slot] = x[v_s]

    # ---- ELL adjacency (vectorized) ----------------------------------------
    def _max_count(rows_2d, limit):
        k_i, e_i = np.nonzero(rows_2d < limit)
        if len(k_i) == 0:
            return 1
        key = k_i.astype(np.int64) * limit + rows_2d[k_i, e_i]
        return int(np.bincount(key).max())

    D = d or _max_count(dst_part, NKH)
    D2 = d_out or _max_count(src_idx, NKH)
    part_inc = np.empty((n_ep, NKH, D), np.int32)
    ext_out = np.empty((n_ep, NKH, D2), np.int32)
    for k in range(n_ep):                       # bulk _ell_pack per shard
        real = dst_part[k] < NKH
        part_inc[k] = _ell_pack(dst_part[k][real],
                                np.nonzero(real)[0].astype(np.int64),
                                NKH, D, EK, "part_inc")
        reals = src_idx[k] < NKH
        ext_out[k] = _ell_pack(src_idx[k][reals],
                               np.nonzero(reals)[0].astype(np.int64),
                               NKH, D2, EK, "ext_out")

    # ---- serving side: slots this shard's owned nodes feed -----------------
    # shard j serves boundary node v (owned by j) to requester k at k's slot
    # (j, i); on j the wire position is [k, i] (all_to_all pairs [k]<->[j]).
    recv_idx = np.full((n_ep, T), NK, np.int32)
    if len(v_s):
        recv_idx[j_s, k_s * S + slot] = (v_s - j_s * block).astype(np.int32)
    DR = d_recv or _max_count(recv_idx, NK)
    own_recv_inc = np.empty((n_ep, NK, DR), np.int32)
    for k in range(n_ep):
        srv = recv_idx[k] < NK
        own_recv_inc[k] = _ell_pack(recv_idx[k][srv].astype(np.int64),
                                    np.nonzero(srv)[0].astype(np.int64),
                                    NK, DR, T, "own_recv_inc")

    # ---- pooling over owned nodes ------------------------------------------
    node_ids = np.arange(NT, dtype=np.int64)
    n_owner = owner(node_ids)
    n_pos = node_ids - n_owner * block
    DN = dn or max(1, int(np.bincount(
        n_owner * n_graphs + graph_of, minlength=1).max(initial=1)))
    graph_nodes = np.empty((n_ep, n_graphs, DN), np.int32)
    node_graph = np.full((n_ep, NK), n_graphs, np.int32)
    node_graph[n_owner, n_pos] = graph_of
    for k in range(n_ep):
        sel = n_owner == k
        graph_nodes[k] = _ell_pack(graph_of[sel], n_pos[sel],
                                   n_graphs, DN, NK, "graph_nodes")

    # global in-degree -> per-owner inverse (aggr='mean' normalization)
    deg = np.bincount(recv_g, minlength=NT).astype(np.float64)
    inv_deg_own = np.zeros((n_ep, NK), np.float32)
    nz = deg > 0
    inv_deg_own[n_owner[nz], n_pos[nz]] = (1.0 / deg[nz]).astype(np.float32)

    labels_out = np.broadcast_to(
        np.asarray(labels, np.float32), (n_ep, n_graphs)).copy()
    graph_mask = np.ones((n_ep, n_graphs), np.float32)

    return EdgeShardedBatch(node_x, edge_attr, src_idx, rev, dst_part,
                            part_inc, ext_out, recv_idx, own_recv_inc,
                            graph_nodes, node_graph, inv_deg_own,
                            labels_out, graph_mask)


def _linear(p, x, dtype):
    return (jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + p["b"].astype(jnp.float32))


def _exchange(buf, axis):
    """all_to_all a [n_ep, S, H] boundary buffer over the ICI axis:
    out[j] = the chunk shard j addressed to this shard."""
    return jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0)


def ep_forward(params: dict, b: EdgeShardedBatch, cfg: CGRMPNNConfig,
               *, axis: str = "ep", train: bool = False,
               rng: jax.Array | None = None
               ) -> tuple[jax.Array, jax.Array]:
    """Per-shard forward (call inside shard_map over ``axis``).

    ``b`` leaves are the shard-local slices (no leading shard axis).
    Returns (full-batch sse — identical on every 'ep' member, so psum over
    'ep' must divide by n_ep — and per-graph predictions [B]).
    """
    if cfg.aggr not in ("add", "mean"):
        raise ValueError(f"unsupported aggr {cfg.aggr!r}")
    # mean: in-degrees are static per batch, so the normalization is a
    # host-precomputed per-owned-node scale applied BEFORE the halo pull —
    # no extra exchange needed
    mean_scale = b.inv_deg_own[:, None] if cfg.aggr == "mean" else None
    act = ACTIVATIONS[cfg.activation]
    dt = cfg.compute_dtype
    n_ep = jax.lax.axis_size(axis)
    NK = b.own_recv_inc.shape[0]
    NKH = b.node_x.shape[0]
    T = NKH - NK
    S = T // n_ep
    H = params["convs"][0]["w"].shape[0]

    if train and rng is not None:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        drop_keys = list(jax.random.split(rng, cfg.depth))
    else:
        drop_keys = [None] * cfg.depth

    # Split every ext-space op into owned rows [:NK] and boundary rows [NK:)
    # so each all_to_all has independent local work to hide behind (XLA's
    # latency-hiding scheduler overlaps async collectives with any op they
    # don't depend on; one fused op over all NKH rows would serialize them).
    # Splitting by rows leaves each row's accumulation order untouched, and
    # sentinel rows gather exact 0.0 — numerics are unchanged.
    dst_own = jnp.where(b.dst_part < NK, b.dst_part, NK)
    dst_bnd = jnp.where((b.dst_part >= NK) & (b.dst_part < NKH),
                        b.dst_part - NK, T)
    src_own = jnp.where(b.src_idx < NK, b.src_idx, NK)
    src_bnd = jnp.where((b.src_idx >= NK) & (b.src_idx < NKH),
                        b.src_idx - NK, T)

    def incoming_owned(h):
        """Complete incoming sums on owned nodes: boundary partials are
        computed FIRST so their all_to_all push launches while the
        owned-row sums run."""
        part_bnd = node_partial_sum(h, b.part_inc[NK:], dst_bnd)  # [T, H]
        pushed = _exchange(part_bnd.reshape(n_ep, S, -1), axis)
        part_own = node_partial_sum(h, b.part_inc[:NK], dst_own)  # [NK, H]
        return part_own + node_partial_sum(
            pushed.reshape(T, -1), b.own_recv_inc, b.recv_idx)

    def messages(h, a_own):
        """t[e] = a[src(e)] - h[rev(e)] with the halo pull overlapped: the
        owned-src gather (the bulk of the work) is independent of the
        pulled boundary rows."""
        serve = gather_nodes(a_own, b.recv_idx, b.own_recv_inc)  # [T, H]
        pulled = _exchange(serve.reshape(n_ep, S, -1), axis)
        t_own = gather_nodes(a_own, src_own, b.ext_out[:NK])     # [EK, H]
        t_bnd = gather_nodes(pulled.reshape(T, -1), src_bnd, b.ext_out[NK:])
        return t_own + t_bnd - gather_rev(h, b.rev)

    x_src = gather_nodes(b.node_x, b.src_idx, b.ext_out)        # [EK, F]
    h0 = act(_linear(params["edge_init"],
                     jnp.concatenate([x_src, b.edge_attr], 1), dt))
    h = h0
    for l in range(cfg.depth):
        a_own = incoming_owned(h)
        if mean_scale is not None:
            a_own = a_own * mean_scale
        t = messages(h, a_own)
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

    s_own = incoming_owned(h)                                   # [NK, H]
    if mean_scale is not None:
        s_own = s_own * mean_scale
    x_own = b.node_x[:NK]
    hn = act(_linear(params["edge_to_node"],
                     jnp.concatenate([x_own, s_own], 1), dt))
    pool_part = node_partial_sum(hn, b.graph_nodes, b.node_graph)  # [B, H]
    # ffn folded pre-psum (bias split as b/n_ep) so per-shard autodiff +
    # gradient psum is exact — no replicated-region double counting
    z = jnp.dot(pool_part.astype(dt), params["ffn"]["w"].astype(dt),
                preferred_element_type=jnp.float32) \
        + params["ffn"]["b"].astype(jnp.float32) / n_ep
    preds = jax.lax.psum(z, axis)[:, 0]
    err = (preds - b.labels) * b.graph_mask
    return jnp.sum(err * err), preds


def make_ep_train_step(optimizer: optax.GradientTransformation,
                       cfg: CGRMPNNConfig, mesh: Mesh):
    """Combined dp x ep train step over stacked EdgeShardedBatches.

    Batch leaves are stacked [n_dp, n_ep, ...]: axis 0 sharded over 'dp',
    axis 1 over 'ep'.
    """
    n_ep = mesh.shape["ep"]

    def per_device(state: TrainState, batch: EdgeShardedBatch):
        local = jax.tree_util.tree_map(lambda v: v[0, 0], batch)
        rng, sub = jax.random.split(state.rng)
        sub = jax.random.fold_in(sub, jax.lax.axis_index("dp"))

        def loss_fn(params):
            sse, _ = ep_forward(params, local, cfg, axis="ep",
                                train=True, rng=sub)
            return sse

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # every 'ep' member computes the full dp-group sse -> divide
        loss = jax.lax.psum(loss / n_ep, ("dp", "ep"))
        grads = jax.lax.psum(grads, ("dp", "ep"))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, rng), loss

    batch_spec = jax.tree_util.tree_map(
        lambda _: P("dp", "ep"), EdgeShardedBatch(*[0] * 14))
    smapped = jax.shard_map(per_device, mesh=mesh,
                            in_specs=(P(), batch_spec),
                            out_specs=(P(), P()), check_vma=False)
    # NO buffer donation: the trainer's NaN guard rolls back to the state it
    # passed into the failing step — donating would delete those buffers
    return jax.jit(smapped)


def make_ep_eval_step(cfg: CGRMPNNConfig, mesh: Mesh):
    """Jitted ``eval(params, stacked_batch) -> (sum_sse, preds[n_dp*B])``
    over stacked EdgeShardedBatches (leaves [n_dp, n_ep, ...])."""
    n_ep = mesh.shape["ep"]

    def per_device(params, batch: EdgeShardedBatch):
        local = jax.tree_util.tree_map(lambda v: v[0, 0], batch)
        sse, preds = ep_forward(params, local, cfg, axis="ep")
        # sse/preds are replicated across 'ep' (each member computed the
        # full-batch values); the dp-group total divides by n_ep
        return jax.lax.psum(sse / n_ep, ("dp", "ep")), preds

    batch_spec = jax.tree_util.tree_map(
        lambda _: P("dp", "ep"), EdgeShardedBatch(*[0] * 14))
    smapped = jax.shard_map(per_device, mesh=mesh,
                            in_specs=(P(), batch_spec),
                            out_specs=(P(), P("dp")), check_vma=False)
    return jax.jit(smapped)
