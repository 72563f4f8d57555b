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

    def __post_init__(self):
        packs = max(1, int(np.ceil(self.batch_size / self.spec.tb)))
        r = max(1, self.round_packs_to)
        packs = -(-packs // r) * r
        self.spec = self.spec.with_packs(packs)
        self._epoch = 0
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
        """Pack as many of ``rows`` as fit; returns (batch, n_consumed)."""
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
            try:
                if self.use_native:
                    from .. import native
                    return native.pack_graphs_native(
                        graphs, labels, self.spec, extra,
                        row_ids=window), n
                return pack_graphs(graphs, labels, self.spec, extra,
                                   row_ids=window), n
            except ValueError:
                if n == 1:
                    raise
                n = max(1, int(n * 0.8))
        raise RuntimeError("unreachable")

    def __iter__(self) -> Iterator[PackedGraphBatch]:
        order = list(self._order())
        pending: list[int] = []
        pos = 0
        while pos < len(order) or pending:
            take = self.batch_size - len(pending)
            pending.extend(order[pos:pos + take])
            pos += take
            if (self.drop_last and pos >= len(order)
                    and len(pending) < self.batch_size):
                return  # skip the final partial batch
            batch, used = self._pack_window(pending)
            pending = pending[used:]
            yield batch

    def prefetch(self, depth: int = 2) -> Iterator[PackedGraphBatch]:
        """Background-thread producer (overlaps packing with device steps)."""
        q: queue.Queue = queue.Queue(maxsize=depth)
        _SENTINEL = object()
        err: list[BaseException] = []

        def worker():
            try:
                for b in self:
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
