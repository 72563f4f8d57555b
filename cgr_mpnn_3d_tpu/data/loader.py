"""Host-side batch loader: shuffle -> featurize (cached) -> pack -> device.

Replaces the reference's ``tg.loader.DataLoader`` worker-process pipeline
(trainer.py:105-118) with a static-shape producer: every batch has identical
array shapes (one XLA compilation for the whole run), a background thread
overlaps featurization/packing with device compute, and partial batches are
padded with empty packs instead of triggering recompiles.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from .batch import PackedGraphBatch, PackSpec, pack_graphs
from .dataset import ChemDataset

__all__ = ["PackedLoader"]


@dataclass
class PackedLoader:
    """Iterates a :class:`ChemDataset` as fixed-shape :class:`PackedGraphBatch`es.

    ``batch_size`` is the target number of graphs per step (reference default
    32, trainer.py:98); ``spec.p`` is derived from it once so shapes stay
    static. If a window of graphs overflows its packs (edge/node-heavy
    draws), the window shrinks and the remainder carries into the next batch.
    """
    dataset: ChemDataset
    spec: PackSpec
    batch_size: int = 32
    shuffle: bool = True
    seed: int = 0
    drop_last: bool = False
    use_native: bool | None = None   # None = auto (C++ packer if built)
    # place big graphs first within each window (first-fit-decreasing):
    # measurably better pack fill; row_ids keep outputs row-addressable
    sort_within_batch: bool = True
    # round the pack count up to a multiple (the fused kernel's sub-pack
    # fusion q requires spec.p % q == 0); extra packs are empty/masked
    round_packs_to: int = 1
    # parallel speculative packing in prefetch(): N threads pack upcoming
    # windows concurrently (the native packer's ctypes call releases the
    # GIL).  Yields BIT-IDENTICAL batches to serial iteration: speculation
    # only applies to carry-free aligned windows; a window overflow (rare —
    # spec is sized for batch_size) discards the lookahead and re-packs
    # synchronously.  Size to the host: ~1 worker per 2 vCPUs.
    workers: int = 1
    # pack each epoch's batches ONCE and reuse them across epochs, shuffling
    # BATCH order per epoch instead of graph order.  Kills the host-side
    # packing cost from epoch 2 on (measured: the chip consumes ~16 Medge/s
    # while one 2-vCPU host packs ~3 Medge/s — without reuse the input
    # pipeline is the bottleneck on small hosts).  Tradeoff: graph-to-batch
    # assignment is frozen after epoch 1 (shuffle granularity becomes the
    # batch, webdataset-shard-style); gradient noise is marginally less
    # i.i.d.  Memory: one epoch of packed arrays (~50 MB for a T1x-sized
    # split at bs=64).
    reuse_packs: bool = False

    def __post_init__(self):
        packs = max(1, int(np.ceil(self.batch_size / self.spec.tb)))
        r = max(1, self.round_packs_to)
        packs = -(-packs // r) * r
        self.spec = self.spec.with_packs(packs)
        self._epoch = 0
        self._pack_cache: list[PackedGraphBatch] | None = None
        if self.use_native is None:
            from .. import native
            self.use_native = native.available()

    def __len__(self) -> int:
        return int(np.ceil(len(self.dataset) / self.batch_size))

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle order to a global epoch index so resumed runs
        replay the exact same data order (torch DistributedSampler-style)."""
        self._epoch = epoch

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _pack_window(self, rows: list[int]) -> tuple[PackedGraphBatch, int]:
        """Pack as many of ``rows`` as fit; returns (batch, n_consumed).

        Native path: the overflow-shrink loop probes feasibility with the
        placement-only `cgr_place_graphs` (no output allocation/writes —
        at bs-64 with te=128 tiles shrinking is the NORM, and a full pack
        per doomed attempt dominated the per-window cost), then packs
        exactly once at the surviving n."""
        n = len(rows)
        while n > 0:
            window = rows[:n]
            if self.sort_within_batch:
                window = sorted(
                    window, key=lambda i: -self.dataset.graph(i).num_edges)
            graphs = [self.dataset.graph(i) for i in window]
            labels = [self.dataset.labels[i] for i in window]
            extra = ([self.dataset.extra_feats(i) for i in window]
                     if self.dataset.use_npz else None)
            if self.use_native:
                from .. import native
                if not native.place_graphs_native(graphs, self.spec):
                    if n == 1:
                        raise ValueError(native.last_error())
                    n = max(1, int(n * 0.8))
                    continue
                return native.pack_graphs_native(
                    graphs, labels, self.spec, extra, row_ids=window), n
            try:
                return pack_graphs(graphs, labels, self.spec, extra,
                                   row_ids=window), n
            except ValueError:
                if n == 1:
                    raise
                n = max(1, int(n * 0.8))
        raise RuntimeError("unreachable")

    def plan_windows(self, order) -> list[list[int]]:
        """The exact window/carry plan serial iteration would emit —
        which rows land in which emitted batch, including the overflow
        shrink (n -> int(n*0.8)) and the carry of unconsumed rows —
        computed with the placement-only probe (no packing, no output
        allocation).  Multi-host training uses this so EVERY process
        agrees on window boundaries while packing only the windows its
        own devices consume (trainer._mh_stream)."""
        from .batch import place_graphs
        if self.use_native:
            from .. import native
            probe = lambda gs: native.place_graphs_native(gs, self.spec)
        else:
            probe = lambda gs: place_graphs(gs, self.spec)
        plan: list[list[int]] = []
        pending: list[int] = []
        order = [int(i) for i in order]
        pos = 0
        while pos < len(order) or pending:
            take = self.batch_size - len(pending)
            rows = pending + order[pos:pos + take]
            pos += take
            if (self.drop_last and pos >= len(order)
                    and len(rows) < self.batch_size):
                break
            n = len(rows)
            while n > 0:
                window = rows[:n]
                if self.sort_within_batch:
                    window = sorted(
                        window,
                        key=lambda i: -self.dataset.graph(i).num_edges)
                if probe([self.dataset.graph(i) for i in window]):
                    break
                if n == 1:
                    # surface the same error the real pack would raise
                    self._pack_window(rows[:1])
                    raise RuntimeError("unreachable: probe failed but "
                                       "pack succeeded")
                n = max(1, int(n * 0.8))
            plan.append(rows[:n])
            pending = rows[n:]
        return plan

    def __iter__(self) -> Iterator[PackedGraphBatch]:
        yield from self._iter(self.workers)

    def _iter(self, workers: int) -> Iterator[PackedGraphBatch]:
        if self.reuse_packs:
            if self._pack_cache is None:
                # compose the cache from the FIXED epoch-0 graph order so a
                # resumed process rebuilds bit-identical batches regardless
                # of which epoch it resumes into; per-epoch randomness is
                # the batch-order shuffle in _iter_cached
                saved = self._epoch
                self._epoch = 0
                try:
                    self._pack_cache = self._build_cache(workers)
                finally:
                    self._epoch = saved
            yield from self._iter_cached()
            return
        yield from self._iter_pack(workers)

    def _build_cache(self, workers: int) -> list[PackedGraphBatch]:
        """Pack the whole epoch for reuse.  With the native packer this is
        ONE ctypes mega-call (packer.cpp cgr_pack_epoch) — the per-window
        marshal overhead that bounds epoch-1 at ~0.5 Medge/s on small
        hosts disappears (measured 2.8-3.3 Medge/s in one call,
        BASELINE.md); bit-identical to per-window iteration
        (tests/test_native.py)."""
        if self.use_native:
            from .. import native
            order = self._order().tolist()
            graphs = [self.dataset.graph(i) for i in order]
            labels = [self.dataset.labels[i] for i in order]
            extra = ([self.dataset.extra_feats(i) for i in order]
                     if self.dataset.use_npz else None)
            return native.pack_epoch_native(
                graphs, labels, self.spec, self.batch_size,
                extra_node_feats=extra, row_ids=order,
                sort_within=self.sort_within_batch,
                drop_last=self.drop_last)
        return list(self._iter_pack(workers))

    def _iter_cached(self) -> Iterator[PackedGraphBatch]:
        """Reuse-epoch path: cached batches in epoch-seeded order."""
        order = np.arange(len(self._pack_cache))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        for i in order:
            yield self._pack_cache[i]

    def _iter_pack(self, workers: int) -> Iterator[PackedGraphBatch]:
        """Pack-every-window iteration; with ``workers > 1``, upcoming
        carry-free aligned windows are packed speculatively on a thread
        pool (bit-identical output to the serial path — misaligned windows
        after an overflow are packed synchronously)."""
        from concurrent.futures import ThreadPoolExecutor

        order = list(self._order())
        ex = (ThreadPoolExecutor(workers) if workers > 1 else None)
        futures: dict[int, object] = {}     # aligned start pos -> Future
        lookahead = (workers + 2) if ex is not None else 0

        def spawn(start: int) -> None:
            win = order[start:start + self.batch_size]
            if win and start not in futures:
                if self.drop_last and len(win) < self.batch_size:
                    return
                futures[start] = ex.submit(self._pack_window, list(win))

        try:
            pending: list[int] = []
            pos = 0
            if ex is not None:
                for k in range(lookahead):
                    spawn(k * self.batch_size)
            while pos < len(order) or pending:
                take = self.batch_size - len(pending)
                rows = pending + order[pos:pos + take]
                aligned = not pending
                start = pos
                pos += take
                if (self.drop_last and pos >= len(order)
                        and len(rows) < self.batch_size):
                    return  # skip the final partial batch
                fut = futures.pop(start, None) if aligned else None
                if fut is not None:
                    batch, used = fut.result()
                else:
                    batch, used = self._pack_window(rows)
                pending = rows[used:]
                if pending and futures:
                    # overflow: every speculated window is now misaligned
                    futures.clear()
                if ex is not None and not pending:
                    for k in range(lookahead):
                        spawn(pos + k * self.batch_size)
                yield batch
        finally:
            if ex is not None:
                ex.shutdown(wait=False, cancel_futures=True)

    def prefetch(self, depth: int = 2,
                 workers: int | None = None) -> Iterator[PackedGraphBatch]:
        """Background-thread producer (overlaps packing with device steps);
        ``workers`` overrides the loader's parallel-packing width for THIS
        iteration only (plain ``iter(loader)`` keeps ``self.workers``)."""
        w = self.workers if workers is None else workers
        q: queue.Queue = queue.Queue(maxsize=depth)
        _SENTINEL = object()
        err: list[BaseException] = []

        def worker():
            try:
                for b in self._iter(w):
                    q.put(b)
            except BaseException as e:  # surfaced to the consumer
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
