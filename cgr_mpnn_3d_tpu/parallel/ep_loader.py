"""Host-side loaders for edge-partitioned training (CLI ``--ep N``).

Bridges :class:`~..data.dataset.ChemDataset` to the edge-sharding packers:
each step batch is ``batch_size`` whole graphs sharded over the 'ep' mesh
axis, with ``n_dp`` such batches stacked into one ``[n_dp, n_ep, ...]`` tree
for the combined dp x ep train step.  TPU obligations handled here,
mirroring data/loader.py:

* **Static shapes.**  The packers' padded sizes are *pinned* so every batch
  of a run shares one jit compilation.  Pins come from a pre-scan of the
  first epoch's batches plus headroom; a later batch that still overflows
  (:class:`~.edge_partition.EPOverflow` — ONLY that type, so real input
  errors surface immediately) grows the pins monotonically, re-shards the
  group at the new pins, and costs one recompile.  Only the failing window
  pays an extra unpinned pass to learn its natural sizes.
* **Fixed graph count.**  Short batches are padded with mask-0 dummy graphs
  (1 node, 0 edges) so the per-graph axis B is static.
* **Prefetch.**  A background thread overlaps host sharding with device
  steps (same contract as PackedLoader.prefetch).

Two loaders share the machinery:

* :class:`EPPackLoader` — the default ``--ep`` path: pack-local shard layout
  (parallel/ep_pack.py) whose hot ops run as one-hot SpMM Pallas kernels.
* :class:`EPLoader` — the flat ext-index layout (parallel/edge_partition.py),
  kept as the differential-testing reference for the packed path.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field, replace
from typing import Sequence

import numpy as np

from ..chem.featurize import GraphArrays
from ..data.dataset import ChemDataset
from .edge_partition import EdgeShardedBatch, EPOverflow, shard_edges
from .ep_pack import (EPPackedBatch, EPPackSpec, empty_ep_pack_batch,
                      pack_shard_edges)

__all__ = ["EPLoader", "EPPackLoader", "empty_ep_batch_like",
           "natural_ep_pins"]

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
class _BaseEPLoader:
    """Shared window/epoch/prefetch/pin-growth machinery (see module doc).

    Subclasses implement ``_shard_pinned``, ``_learn`` (grow pins from one
    window's natural sizes) and ``_filler``.
    """
    dataset: ChemDataset
    n_ep: int
    batch_size: int = 32          # graphs per dp-local step batch
    n_dp: int = 1
    shuffle: bool = True
    seed: int = 0
    prescan_batches: int = 8      # epoch-0 batches sampled to set pins
    # shard/pack each epoch ONCE and reuse across epochs with batch-order
    # shuffling (PackedLoader.reuse_packs contract): the host-side packing
    # cost - the production bottleneck once chips consume ~16 Medge/s each,
    # and here multiplied by n_dp x n_ep shards - vanishes from epoch 2 on.
    # The cache is composed from the fixed epoch-0 graph order (resume
    # determinism) and rebuilt if pins grew during the build, so every
    # cached group shares the final pinned spec (one jit compilation).
    reuse_packs: bool = False
    # parallel shard-packing width (PackedLoader.workers contract): the
    # n_dp windows of a group are packed concurrently on a thread pool —
    # numpy releases the GIL on array work, and production TPU hosts have
    # ~112 vCPUs for 4-8 chips.  BIT-IDENTICAL to serial: packing under
    # FIXED pins is a pure function per window, and any EPOverflow
    # discards the parallel results and reruns the group through the
    # serial growth loop (same learn order, same final pins).
    workers: int = 1

    def __post_init__(self):
        if len(self.dataset) == 0:
            raise ValueError("empty dataset")
        self._epoch = 0
        self._cache: list | None = None
        self._dummy = self._make_dummy()
        if not self._has_pins():
            for w in self._prescan_windows():
                self._learn(w)

    # -- subclass interface -------------------------------------------------
    def _has_pins(self) -> bool:
        raise NotImplementedError

    def _shard_pinned(self, window):
        raise NotImplementedError

    def _learn(self, window) -> None:
        """Grow pins (monotone, with headroom) from a window's naturals."""
        raise NotImplementedError

    def _filler(self, like):
        raise NotImplementedError

    # -- interface parity with PackedLoader ---------------------------------
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

    def _prescan_windows(self):
        order = self._order()
        bs = self.batch_size
        n = min(self.prescan_batches, int(np.ceil(len(order) / bs)))
        return [self._window(order[i * bs:(i + 1) * bs]) for i in range(n)]

    def __iter__(self):
        if self.reuse_packs:
            if self._cache is None:
                saved = self._epoch
                self._epoch = 0
                try:
                    for _attempt in range(4):
                        before = self._pin_state()
                        items = list(self._iter_build())
                        if self._pin_state() == before:
                            break
                        # pins grew mid-build: entries mix specs - rebuild
                        # at the (monotone) final pins
                    else:
                        raise RuntimeError(
                            "EP pins failed to stabilize over 4 builds")
                finally:
                    self._epoch = saved
                self._cache = items
            order = np.arange(len(self._cache))
            if self.shuffle:
                rng = np.random.default_rng(self.seed + self._epoch)
                rng.shuffle(order)
            for i in order:
                yield self._cache[i]
            return
        yield from self._iter_build()

    def _pin_state(self):
        """Hashable snapshot of the learned pins (growth detection)."""
        raise NotImplementedError

    def _iter_build(self):
        from concurrent.futures import ThreadPoolExecutor

        order = list(self._order())
        bs = self.batch_size
        windows = [self._window(order[i:i + bs])
                   for i in range(0, len(order), bs)]
        ex = (ThreadPoolExecutor(self.workers)
              if self.workers > 1 and self.n_dp > 1 else None)
        try:
            for g0 in range(0, len(windows), self.n_dp):
                group_windows = windows[g0:g0 + self.n_dp]
                group = None
                if ex is not None:
                    try:
                        # pins are FIXED during the map; pure per-window
                        # packing -> order-preserving, bit-identical
                        group = list(ex.map(self._shard_pinned,
                                            group_windows))
                    except EPOverflow:
                        group = None   # redo serially with pin growth
                if group is None:
                    group = []
                    i = 0
                    grows = 0
                    while i < len(group_windows):
                        try:
                            group.append(
                                self._shard_pinned(group_windows[i]))
                            i += 1
                        except EPOverflow:
                            grows += 1
                            if grows > 2 * len(group_windows):
                                raise
                            # grow pins from THIS window's naturals (only
                            # the failing window pays an unpinned pass),
                            # then re-shard the whole group at the new
                            # pinned shapes
                            self._learn(group_windows[i])
                            group, i = [], 0
                if len(group) < self.n_dp:
                    filler = self._filler(group[0])
                    group += [filler] * (self.n_dp - len(group))
                yield self._emit(_stack_group(group))
        finally:
            if ex is not None:
                ex.shutdown(wait=False, cancel_futures=True)

    def _emit(self, stacked):
        """Hook: what one iteration yields (EPPackLoader attaches the spec
        the batch was built under, so prefetched batches stay consistent
        across mid-epoch pin growth)."""
        return stacked

    def prefetch(self, depth: int = 2):
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


@dataclass
class EPLoader(_BaseEPLoader):
    """Yields stacked ``[n_dp, n_ep, ...]`` EdgeShardedBatch trees (flat
    ext-index layout — the differential reference for EPPackLoader)."""
    pins: dict | None = field(default=None)

    def _has_pins(self) -> bool:
        return self.pins is not None

    def _pin_state(self):
        return None if self.pins is None else tuple(sorted(
            self.pins.items()))

    def _shard_pinned(self, window) -> EdgeShardedBatch:
        graphs, labels, extra, n_real = window
        b = shard_edges(graphs, labels, self.n_ep,
                        extra_node_feats=extra, **(self.pins or {}))
        if n_real < self.batch_size:
            mask = b.graph_mask.copy()
            mask[:, n_real:] = 0.0
            b = b._replace(graph_mask=mask)
        return b

    def _learn(self, window) -> None:
        graphs, labels, extra, _ = window
        nat = natural_ep_pins(shard_edges(graphs, labels, self.n_ep,
                                          extra_node_feats=extra))
        pins = dict(self.pins or {})
        for k, v in nat.items():
            g = _r8(int(np.ceil(v * _HEADROOM)))
            pins[k] = max(g, pins.get(k, 0))
        self.pins = pins

    def _filler(self, like: EdgeShardedBatch) -> EdgeShardedBatch:
        return empty_ep_batch_like(like)


@dataclass
class EPPackLoader(_BaseEPLoader):
    """Yields stacked ``[n_dp, n_ep, ...]`` EPPackedBatch trees — the
    default ``--ep`` path (pack-local layout, Pallas-kernel speed).

    ``spec`` is the pinned :class:`~.ep_pack.EPPackSpec`; the trainer keys
    its jitted step on it and rebuilds on growth (one recompile)."""
    te: int = 128
    tn: int = 72
    spec: EPPackSpec | None = field(default=None)

    def _has_pins(self) -> bool:
        return self.spec is not None

    def _pin_state(self):
        return self.spec

    def _shard_pinned(self, window) -> EPPackedBatch:
        graphs, labels, extra, n_real = window
        b, _ = pack_shard_edges(graphs, labels, self.n_ep, te=self.te,
                                tn=self.tn, extra_node_feats=extra,
                                spec=self.spec)
        if n_real < self.batch_size:
            mask = b.graph_mask.copy()
            mask[:, n_real:] = 0.0
            b = b._replace(graph_mask=mask)
        return b

    def _learn(self, window) -> None:
        graphs, labels, extra, _ = window
        _, nat = pack_shard_edges(graphs, labels, self.n_ep, te=self.te,
                                  tn=self.tn, extra_node_feats=extra)
        gro = lambda v: _r8(int(np.ceil(v * _HEADROOM)))
        cur = self.spec
        if cur is None:
            self.spec = replace(
                nat, p=max(1, int(np.ceil(nat.p * _HEADROOM))),
                d=gro(nat.d), d2=gro(nat.d2), dr=gro(nat.dr),
                dn=gro(nat.dn), b=self.batch_size,
                caps=tuple(gro(c) if c else 0 for c in nat.caps),
                gp=gro(nat.gp), kg=gro(nat.kg))
        else:
            if nat.te > cur.te or nat.tn > cur.tn:
                # natural build auto-grew the tile (giant fragment)
                cur = replace(cur, te=max(cur.te, nat.te),
                              tn=max(cur.tn, nat.tn))
            self.spec = replace(
                cur, p=max(cur.p, int(np.ceil(nat.p * _HEADROOM))),
                d=max(cur.d, gro(nat.d)), d2=max(cur.d2, gro(nat.d2)),
                dr=max(cur.dr, gro(nat.dr)), dn=max(cur.dn, gro(nat.dn)),
                b=max(cur.b, self.batch_size),
                caps=tuple(max(c, gro(n) if n else 0)
                           for c, n in zip(cur.caps, nat.caps)),
                gp=max(cur.gp, gro(nat.gp)), kg=max(cur.kg, gro(nat.kg)))
        self.te, self.tn = self.spec.te, self.spec.tn

    def _filler(self, like: EPPackedBatch) -> EPPackedBatch:
        return empty_ep_pack_batch(self.spec, like.node_x.shape[2],
                                   like.edge_attr.shape[2])

    def _emit(self, stacked):
        return self.spec, stacked


def _stack_group(group: list) -> EdgeShardedBatch | EPPackedBatch:
    cls = type(group[0])
    return cls(*[np.stack([getattr(b, f) for b in group], 0)
                 for f in cls._fields])
