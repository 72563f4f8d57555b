"""Reaction/molecule dataset: CSV + optional MACE-descriptor npz fusion.

Equivalent of the reference's ChemDataset (ChemDataset.py:10-116): column 0 =
SMILES, column 1 = label; graphs are featurized once per unique SMILES and
cached; an optional ``.npz`` holds per-row MACE descriptor blocks keyed
``arr_{i}`` that are concatenated onto node features (ChemDataset.py:37-42,
83-86).

Deviations (deliberate):
* arrays are numpy (host) feeding the static-shape packer, not torch tensors;
* MACE blocks are attached per-row at pack time instead of being baked into
  the per-SMILES cache — the reference caches the *first* row's descriptors
  for duplicated SMILES (ChemDataset.py:55-67), which is a latent bug we do
  not replicate;
* the reference's negative-index quirk (ChemDataset.py:84 computes
  ``len - key`` instead of ``len + key``) is not replicated; plain python
  negative indexing works.
"""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np

from ..chem.featurize import GraphArrays, MolGraph, RxnGraph

__all__ = ["ChemDataset"]


class ChemDataset:
    def __init__(self, data_path: str, mode: str = "rxn",
                 data_npz_path: str | None = None,
                 use_native: bool | None = None,
                 has_header: bool | None = None):
        if mode not in ("mol", "rxn"):
            raise ValueError(f"Unknown option for mode {mode!r}")
        self.mode = mode
        self.data_path = Path(data_path)
        if use_native is None:
            from .. import native
            use_native = native.available()
        self.use_native = use_native

        smiles, labels = [], []
        with open(self.data_path, newline="") as f:
            reader = csv.reader(f)
            first = next(reader, None)
            if first is None:
                first = []
            if has_header is None:
                # Sniff on the LABEL column (the one actually consumed as a
                # float below) — sniffing on the last column can silently
                # drop the first data row of a header-less CSV that carries
                # trailing non-numeric columns.  Single-column files (no
                # label) are treated as header-less.
                has_header = len(first) > 1 and not _is_float(first[1])
            if not has_header:
                f.seek(0)
                reader = csv.reader(f)
            for row in reader:
                if not row:
                    continue
                smiles.append(row[0])
                labels.append(np.float32(row[1]) if len(row) > 1 else np.float32(0))
        self.smiles: list[str] = smiles
        self.labels = np.asarray(labels, dtype=np.float32)

        self._cache: dict[str, GraphArrays] = {}

        self.use_npz = data_npz_path is not None
        self.mace_features: dict[int, np.ndarray] = {}
        if self.use_npz:
            with np.load(data_npz_path) as npz:
                for key in npz.files:
                    # reference keys are arr_0..arr_{n-1} (ChemDataset.py:40-42)
                    idx = int(key.split("_")[-1])
                    self.mace_features[idx] = np.asarray(npz[key], np.float32)

    def __len__(self) -> int:
        return len(self.smiles)

    def graph(self, key: int) -> GraphArrays:
        """Featurized graph for row ``key`` (cached per unique SMILES,
        mirroring ChemDataset.py:54-68)."""
        smi = self.smiles[key]
        g = self._cache.get(smi)
        if g is None:
            if self.use_native:
                from .. import native
                g = native.featurize(smi, self.mode)
            elif self.mode == "mol":
                g = MolGraph(smi).arrays
            else:
                g = RxnGraph(smi).arrays
            self._cache[smi] = g
        return g

    def extra_feats(self, key: int) -> np.ndarray | None:
        """Per-atom MACE descriptor block for row ``key`` (or None)."""
        if not self.use_npz:
            return None
        if key < 0:
            key = len(self.smiles) + key
        return self.mace_features[key]

    def __getitem__(self, key: int) -> tuple[GraphArrays, np.float32,
                                             np.ndarray | None]:
        return self.graph(key), self.labels[key], self.extra_feats(key)

    @property
    def num_node_features(self) -> int:
        n = self.graph(0).node_feats.shape[1]
        if self.use_npz:
            n += self.mace_features[0].shape[1]
        return n

    @property
    def num_edge_features(self) -> int:
        return self.graph(0).edge_feats.shape[1]

    # bump when featurization semantics change (invalidates disk caches)
    FEAT_VERSION = 2  # v2: rev_edge_index persisted explicitly

    def _cache_path(self) -> Path:
        return self.data_path.with_suffix(self.data_path.suffix
                                          + ".featcache.npz")

    def save_feature_cache(self) -> Path:
        """Persist the featurized graphs next to the CSV so later runs skip
        SMILES parsing entirely (the reference re-featurizes every run)."""
        smis = list(self._cache.keys())
        gs = [self._cache[s] for s in smis]
        payload = {
            "smiles": np.asarray(smis, dtype=object),
            "version": np.asarray([self.FEAT_VERSION]),
            "node_feats": np.concatenate([g.node_feats for g in gs], 0),
            "edge_feats": np.concatenate([g.edge_feats for g in gs], 0),
            "senders": np.concatenate([g.senders for g in gs]),
            "receivers": np.concatenate([g.receivers for g in gs]),
            "rev": np.concatenate([g.rev_edge_index for g in gs])
            if gs else np.zeros((0,), np.int32),
            "n_nodes": np.asarray([g.num_nodes for g in gs], np.int64),
            "n_edges": np.asarray([g.num_edges for g in gs], np.int64),
        }
        path = self._cache_path()
        # NB: savez has no allow_pickle kwarg — passing one would write a
        # bogus 'allow_pickle' array into the archive (np.save pickles the
        # object-dtype smiles array on its own).
        np.savez_compressed(path, **payload)
        return path

    def load_feature_cache(self) -> bool:
        """Load a previously saved cache; False if absent/stale."""
        path = self._cache_path()
        if not path.exists() or path.stat().st_mtime < \
                self.data_path.stat().st_mtime:
            return False
        try:
            with np.load(path, allow_pickle=True) as z:
                if int(z["version"][0]) != self.FEAT_VERSION:
                    return False
                smis = list(z["smiles"])
                n_off = np.concatenate([[0], np.cumsum(z["n_nodes"])])
                e_off = np.concatenate([[0], np.cumsum(z["n_edges"])])
                for i, smi in enumerate(smis):
                    ns, ne = slice(n_off[i], n_off[i + 1]), \
                        slice(e_off[i], e_off[i + 1])
                    self._cache[str(smi)] = GraphArrays(
                        node_feats=z["node_feats"][ns].copy(),
                        edge_feats=z["edge_feats"][ne].copy(),
                        senders=z["senders"][ne].copy(),
                        receivers=z["receivers"][ne].copy(),
                        rev_edge_index=z["rev"][ne].copy())
        except Exception:
            return False
        return set(self.smiles) <= set(self._cache)

    def prefeaturize(self, num_workers: int = 0, cache: bool = False) -> None:
        """Eagerly featurize every row (fills the cache).

        With ``num_workers`` > 0 and the native featurizer available, rows
        are featurized in a thread pool — the C++ calls release the GIL, so
        this scales nearly linearly (the reference uses DataLoader worker
        processes for the same job, trainer.py:99).  With ``cache``, a disk
        cache next to the CSV is loaded/saved."""
        if cache and self.load_feature_cache():
            return
        if num_workers and self.use_native:
            from concurrent.futures import ThreadPoolExecutor
            from .. import native
            unique = list({s: None for s in self.smiles})
            with ThreadPoolExecutor(num_workers) as ex:
                for smi, g in zip(unique, ex.map(
                        lambda s: native.featurize(s, self.mode), unique)):
                    self._cache[smi] = g
            if cache:
                self.save_feature_cache()
            return
        for i in range(len(self)):
            self.graph(i)
        if cache:
            self.save_feature_cache()


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False
