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


# ---------------------------------------------------------------------------
# Epoch mega-call packer (cgr_pack_epoch): the --reuse_packs cache build in
# ONE ctypes call must be bit-identical to per-window iteration, including
# the overflow shrink (n -> int(n*0.8)) + carry path and drop_last.
# ---------------------------------------------------------------------------

def _assert_batch_lists_equal(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for w, (x, y) in enumerate(zip(a, b)):
        for name, xa, ya in zip(x._fields, x, y):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(ya),
                                          err_msg=f"window {w}: {name}")


def _demo_loader(tmp_path, bs, te, tn, tb, npz=False, drop_last=False,
                 seed=3):
    from cgr_mpnn_3d_tpu.data import ChemDataset, plan_spec
    from cgr_mpnn_3d_tpu.data.loader import PackedLoader
    if npz:
        from cgr_mpnn_3d_tpu.data.descriptors import \
            synthetic_descriptors_npz
        p = tmp_path / "d.npz"
        synthetic_descriptors_npz(str(DEMO), str(p), 6)
        ds = ChemDataset(str(DEMO), data_npz_path=str(p))
    else:
        ds = ChemDataset(str(DEMO))
    gs = [ds.graph(i) for i in range(len(ds))]
    spec = plan_spec(gs, te=te, tn=tn, tb=tb)
    return PackedLoader(ds, spec, batch_size=bs, shuffle=True, seed=seed,
                        reuse_packs=True, drop_last=drop_last)


@pytest.mark.parametrize("npz", [False, True])
def test_epoch_packer_matches_per_window(tmp_path, npz):
    la = _demo_loader(tmp_path, bs=4, te=128, tn=64, tb=4, npz=npz)
    lb = _demo_loader(tmp_path, bs=4, te=128, tn=64, tb=4, npz=npz)
    next(iter(la), None)                   # builds cache via cgr_pack_epoch
    assert la._pack_cache is not None
    per_window = list(lb._iter_pack(1))    # per-window native path, epoch 0
    _assert_batch_lists_equal(la._pack_cache, per_window)


def test_epoch_packer_overflow_carry_parity(tmp_path):
    """A deliberately tight spec (1 pack of 64 edge slots for 8-graph
    windows) forces the shrink/carry path on nearly every window; the
    mega-call must replicate it exactly."""
    la = _demo_loader(tmp_path, bs=8, te=64, tn=48, tb=8)
    lb = _demo_loader(tmp_path, bs=8, te=64, tn=48, tb=8)
    next(iter(la), None)
    per_window = list(lb._iter_pack(1))
    # the tight spec must actually have overflowed (more windows than
    # ceil(n/bs)) or this test is vacuous
    n = len(lb.dataset)
    assert len(per_window) > -(-n // 8), \
        "spec did not overflow; tighten te/tn"
    _assert_batch_lists_equal(la._pack_cache, per_window)


def test_epoch_packer_drop_last_parity(tmp_path):
    la = _demo_loader(tmp_path, bs=3, te=128, tn=64, tb=3, drop_last=True)
    lb = _demo_loader(tmp_path, bs=3, te=128, tn=64, tb=3, drop_last=True)
    next(iter(la), None)
    per_window = list(lb._iter_pack(1))
    assert len(per_window) == len(lb.dataset) // 3
    _assert_batch_lists_equal(la._pack_cache, per_window)
