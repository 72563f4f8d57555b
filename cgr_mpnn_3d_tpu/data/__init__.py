"""Data pipeline: dataset, static-shape packing, loaders."""

from .batch import (PackedGraphBatch, PackSpec, empty_batch,
                    pack_graphs, packs_needed, place_graphs,
                    plan_spec)
from .dataset import ChemDataset
from .loader import PackedLoader

__all__ = ["PackedGraphBatch", "PackSpec", "empty_batch",
           "pack_graphs", "packs_needed", "place_graphs",
           "plan_spec", "ChemDataset", "PackedLoader"]
