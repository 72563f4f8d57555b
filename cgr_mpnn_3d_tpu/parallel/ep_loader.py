"""Host-side loader for edge-partitioned training (CLI ``--ep N``).

Bridges :class:`~..data.dataset.ChemDataset` to
:func:`~.edge_partition.shard_edges`: each step batch is ``batch_size``
whole graphs sharded over the 'ep' mesh axis, with ``n_dp`` such batches
stacked into one ``[n_dp, n_ep, ...]`` tree for the combined dp x ep train
step.  TPU obligations handled here, mirroring data/loader.py:

* **Static shapes.**  shard_edges' padded sizes (nk/ek/s_max/d/d_out/
  d_recv/dn) are *pinned* so every batch of a run shares one jit
  compilation.  Pins come from a pre-scan of the first epoch's batches plus
  headroom; a later batch that still overflows grows the pins (monotone)
  and re-shards the whole pending dp group, costing one recompile.
* **Fixed graph count.**  Short batches are padded with mask-0 dummy
  graphs (1 node, 0 edges) so the per-graph axis B is static; padded
  labels are 0 and ``graph_mask`` zeroes their loss contribution.
* **Prefetch.**  A background thread overlaps host sharding with device
  steps (same contract as PackedLoader.prefetch).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Iterator, Sequence

import numpy as np

from ..chem.featurize import GraphArrays
from ..data.dataset import ChemDataset
from .edge_partition import EdgeShardedBatch, shard_edges

__all__ = ["EPLoader", "empty_ep_batch_like", "natural_ep_pins"]

_HEADROOM = 1.3


def _r8(v: int, lo: int = 8) -> int:
    return max(lo, int(-(-v // 8)) * 8)


def natural_ep_pins(b: EdgeShardedBatch) -> dict:
    """The padded sizes an EdgeShardedBatch was actually built with."""
    nk = b.own_recv_inc.shape[1]
    nkh = b.node_x.shape[1]
    n_ep = b.node_x.shape[0]
    return {
        "nk": nk,
        "ek": b.src_idx.shape[1],
        "s_max": (nkh - nk) // n_ep,
        "d": b.part_inc.shape[2],
        "d_out": b.ext_out.shape[2],
        "d_recv": b.own_recv_inc.shape[2],
        "dn": b.graph_nodes.shape[2],
    }


def _grow(cur: dict | None, nat: dict) -> dict:
    """Monotone pin growth with headroom (rounded to 8)."""
    out = {}
    for k, v in nat.items():
        g = _r8(int(np.ceil(v * _HEADROOM)))
        out[k] = max(g, cur.get(k, 0)) if cur else g
    return out


def empty_ep_batch_like(b: EdgeShardedBatch) -> EdgeShardedBatch:
    """All-sentinel batch of the same shapes: every gather hits the zero
    row and graph_mask is 0, so its loss and gradients are exactly 0 —
    the dp-group filler for a short final group."""
    NKH = b.node_x.shape[1]
    NK = b.own_recv_inc.shape[1]
    T = NKH - NK
    EK = b.src_idx.shape[1]
    B = b.labels.shape[1]
    return EdgeShardedBatch(
        node_x=np.zeros_like(b.node_x),
        edge_attr=np.zeros_like(b.edge_attr),
        src_idx=np.full_like(b.src_idx, NKH),
        rev=np.full_like(b.rev, EK),
        dst_part=np.full_like(b.dst_part, NKH),
        part_inc=np.full_like(b.part_inc, EK),
        ext_out=np.full_like(b.ext_out, EK),
        recv_idx=np.full_like(b.recv_idx, NK),
        own_recv_inc=np.full_like(b.own_recv_inc, T),
        graph_nodes=np.full_like(b.graph_nodes, NK),
        node_graph=np.full_like(b.node_graph, B),
        inv_deg_own=np.zeros_like(b.inv_deg_own),
        labels=np.zeros_like(b.labels),
        graph_mask=np.zeros_like(b.graph_mask))


@dataclass
class EPLoader:
    """Yields stacked ``[n_dp, n_ep, ...]`` EdgeShardedBatch trees."""
    dataset: ChemDataset
    n_ep: int
    batch_size: int = 32          # graphs per dp-local step batch
    n_dp: int = 1
    shuffle: bool = True
    seed: int = 0
    prescan_batches: int = 8      # epoch-0 batches sampled to set pins
    pins: dict | None = field(default=None)

    def __post_init__(self):
        if len(self.dataset) == 0:
            raise ValueError("empty dataset")
        self._epoch = 0
        self._dummy = self._make_dummy()
        if self.pins is None:
            self._prescan()

    # -- interface parity with PackedLoader --------------------------------
    def __len__(self) -> int:
        n_batches = int(np.ceil(len(self.dataset) / self.batch_size))
        return int(np.ceil(n_batches / self.n_dp))

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    # -- internals ----------------------------------------------------------
    def _make_dummy(self) -> tuple[GraphArrays, np.ndarray | None]:
        g0 = self.dataset.graph(0)
        fe = self.dataset.num_edge_features
        dummy = GraphArrays(
            node_feats=np.zeros((1, g0.node_feats.shape[1]), np.float32),
            edge_feats=np.zeros((0, fe), np.float32),
            senders=np.zeros(0, np.int32),
            receivers=np.zeros(0, np.int32),
            rev_edge_index=np.zeros(0, np.int32))
        extra = None
        if self.dataset.use_npz:
            extra = np.zeros(
                (1, np.asarray(self.dataset.extra_feats(0)).shape[1]),
                np.float32)
        return dummy, extra

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _window(self, rows: Sequence[int]):
        """(graphs, labels, extra, n_real) for one dp-local batch, padded to
        batch_size with mask-0 dummies."""
        graphs = [self.dataset.graph(i) for i in rows]
        labels = [float(self.dataset.labels[i]) for i in rows]
        use_npz = self.dataset.use_npz
        extra = ([self.dataset.extra_feats(i) for i in rows]
                 if use_npz else None)
        n_real = len(rows)
        dummy, dummy_extra = self._dummy
        for _ in range(self.batch_size - n_real):
            graphs.append(dummy)
            labels.append(0.0)
            if use_npz:
                extra.append(dummy_extra)
        return graphs, labels, extra, n_real

    def _shard(self, window) -> EdgeShardedBatch:
        graphs, labels, extra, n_real = window
        b = shard_edges(graphs, labels, self.n_ep,
                        extra_node_feats=extra, **(self.pins or {}))
        if n_real < self.batch_size:
            mask = b.graph_mask.copy()
            mask[:, n_real:] = 0.0
            b = b._replace(graph_mask=mask)
        return b

    def _prescan(self) -> None:
        """Set pins from the first epoch-0 batches (natural sizes x
        headroom) so batches share one compilation."""
        order = self._order()
        pins: dict | None = None
        bs = self.batch_size
        n = min(self.prescan_batches,
                int(np.ceil(len(order) / bs)))
        for i in range(n):
            window = self._window(order[i * bs:(i + 1) * bs])
            nat = natural_ep_pins(self._shard_unpinned(window))
            pins = _grow(pins, nat)
        self.pins = pins

    def _shard_unpinned(self, window) -> EdgeShardedBatch:
        graphs, labels, extra, _ = window
        return shard_edges(graphs, labels, self.n_ep,
                           extra_node_feats=extra)

    def __iter__(self) -> Iterator[EdgeShardedBatch]:
        order = list(self._order())
        bs = self.batch_size
        windows = [self._window(order[i:i + bs])
                   for i in range(0, len(order), bs)]
        for g0 in range(0, len(windows), self.n_dp):
            group_windows = windows[g0:g0 + self.n_dp]
            for attempt in range(3):
                try:
                    group = [self._shard(w) for w in group_windows]
                    break
                except ValueError:
                    if attempt == 2:
                        raise
                    # a batch overflowed the pins: grow monotonically from
                    # this group's natural sizes and re-shard the whole
                    # group (one recompile on the device side).  Ownership
                    # geometry is pin-independent (shard_edges block-size
                    # decoupling), so the naturals always cover the retry.
                    pins = dict(self.pins or {})
                    for w in group_windows:
                        nat = natural_ep_pins(self._shard_unpinned(w))
                        pins = _grow(pins, nat)
                    self.pins = pins
            if len(group) < self.n_dp:
                filler = empty_ep_batch_like(group[0])
                group += [filler] * (self.n_dp - len(group))
            yield _stack_group(group)

    def prefetch(self, depth: int = 2) -> Iterator[EdgeShardedBatch]:
        """Background-thread producer (PackedLoader.prefetch contract)."""
        q: queue.Queue = queue.Queue(maxsize=depth)
        _SENTINEL = object()
        err: list[BaseException] = []

        def worker():
            try:
                for b in self:
                    q.put(b)
            except BaseException as e:
                err.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


def _stack_group(group: list[EdgeShardedBatch]) -> EdgeShardedBatch:
    return EdgeShardedBatch(*[np.stack([getattr(b, f) for b in group], 0)
                              for f in EdgeShardedBatch._fields])
