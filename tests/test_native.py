"""Native C++ featurizer: build + bit-parity vs the Python chem/ stack over
a corpus including the full demo set, plus error handling and a speedup
sanity check."""

import time
from pathlib import Path

import numpy as np
import pytest

from cgr_mpnn_3d_tpu import native
from cgr_mpnn_3d_tpu.chem import MolGraph, RxnGraph

DEMO = Path(__file__).resolve().parent.parent / "examples" / "demo.csv"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

CORPUS_RXN = [line.split(",")[0] for line in
              DEMO.read_text().splitlines()[1:]] + [
    "CCO>>CC=O",
    "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]",
    "CC(=O)N>>CC(=O)N",
]
CORPUS_MOL = ["CCO", "c1ccccc1", "CC(=O)OC", "C1CC1CC", "[13CH4]",
              "c1cc[nH]c1", "ClCCBr", "C=CC=C", "[C-]#[O+]",
              "c1ccc(cc1)-c1ccccc1", "C%10CCCCC%10", "CC(=O)O.[Na+]"]


def _assert_same(a, b, smi):
    np.testing.assert_array_equal(a.senders, b.senders, err_msg=smi)
    np.testing.assert_array_equal(a.receivers, b.receivers, err_msg=smi)
    np.testing.assert_array_equal(a.rev_edge_index, b.rev_edge_index,
                                  err_msg=smi)
    np.testing.assert_allclose(a.node_feats, b.node_feats, rtol=1e-6,
                               atol=1e-6, err_msg=smi)
    np.testing.assert_allclose(a.edge_feats, b.edge_feats, rtol=1e-6,
                               atol=1e-6, err_msg=smi)


def test_rxn_parity():
    for smi in CORPUS_RXN:
        _assert_same(native.featurize(smi, "rxn"), RxnGraph(smi).arrays, smi)


def test_mol_parity():
    for smi in CORPUS_MOL:
        _assert_same(native.featurize(smi, "mol"), MolGraph(smi).arrays, smi)


def test_error_reporting():
    with pytest.raises(native.NativeError, match="unclosed ring"):
        native.featurize("C1CC", "mol")
    with pytest.raises(native.NativeError):
        native.featurize("[Xx]", "mol")


def test_speedup():
    smi = CORPUS_RXN[0]
    native.featurize(smi, "rxn")  # warm
    t0 = time.perf_counter()
    for _ in range(50):
        native.featurize(smi, "rxn")
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(50):
        RxnGraph(smi)
    t_py = time.perf_counter() - t0
    # native must be decisively faster (typically >10x)
    assert t_native < t_py / 3, (t_native, t_py)


def test_packer_parity():
    from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
    graphs = [RxnGraph(s).arrays for s in CORPUS_RXN]
    labels = [float(i) for i in range(len(graphs))]
    spec = plan_spec(graphs, te=64, tn=32, tb=8).with_packs(8)
    a = pack_graphs(graphs, labels, spec)
    b = native.pack_graphs_native(graphs, labels, spec)
    for name, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_packer_parity_with_extra_and_rows():
    from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
    graphs = [RxnGraph(s).arrays for s in CORPUS_RXN[:6]]
    labels = [float(i) for i in range(6)]
    rows = [10, 3, 7, 1, 99, 42]
    rng = np.random.default_rng(0)
    extra = [rng.random((g.num_nodes, 5)).astype(np.float32) for g in graphs]
    spec = plan_spec(graphs, te=64, tn=32, tb=4).with_packs(2)
    a = pack_graphs(graphs, labels, spec, extra, row_ids=rows)
    b = native.pack_graphs_native(graphs, labels, spec, extra, row_ids=rows)
    for name, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_packer_error():
    from cgr_mpnn_3d_tpu.data import plan_spec
    graphs = [RxnGraph(CORPUS_RXN[0]).arrays]
    spec = plan_spec(graphs, te=4, tn=2, tb=1).with_packs(1)
    with pytest.raises(ValueError, match="exceeds pack tile"):
        native.pack_graphs_native(graphs, [0.0], spec)


def test_available_false_on_dlopen_failure(monkeypatch):
    """available() must degrade to False (pure-Python fallback), not crash,
    when the .so cannot be dlopen'd (foreign arch/glibc) — ADVICE r1."""
    import ctypes

    def boom(path):
        raise OSError("wrong ELF class: ELFCLASS64")

    real_cdll = ctypes.CDLL
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(ctypes, "CDLL", boom)
    assert native.available() is False
    # with the real dlopen back, the library loads again
    monkeypatch.setattr(ctypes, "CDLL", real_cdll)
    native._lib = None
    assert native.available() is True


def test_stale_source_triggers_rebuild(tmp_path):
    """A source file newer than the .so marks the build stale."""
    import os
    import time
    assert native.build()  # ensure built
    so = native._SO
    src = native._DIR / "featurizer.cpp"
    old = so.stat().st_mtime
    time.sleep(0.01)
    os.utime(src)  # touch source -> newer than .so
    assert native._stale()
    assert native.build()  # rebuilds
    assert so.stat().st_mtime >= old
    assert not native._stale()
