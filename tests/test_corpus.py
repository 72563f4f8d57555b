"""Vendored featurizer differential corpus (tests/corpus_reactions.csv).

301 diverse, fully atom-mapped T1x-style reactions (fused heteroaromatics,
charged species, isotopes, explicit-H transfers, multi-fragment CGR unions
— tools/gen_featurizer_corpus.py).  Guards:

* Python (chem/) vs C++ (native/featurizer.cpp) bit-parity on EVERY line —
  one wrong perception rule in either implementation fails here first.
* Reference contract invariants: 78/14 feature dims, adjacent directed
  pairs, involutive rev_edge_index (graph_features.py:149-151,187-195).
* chem/rdkit_check.verify_corpus drift machinery (rdkit-free fake backend;
  the real RDKit pass runs via cli.runbook on a connected host).
"""

from pathlib import Path

import numpy as np
import pytest

from cgr_mpnn_3d_tpu import native
from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.chem.rdkit_check import (FeaturizerDrift, rdkit_available,
                                              verify_corpus)

CORPUS = Path(__file__).resolve().parent / "corpus_reactions.csv"


def _lines():
    return [ln.split(",")[0] for ln in
            CORPUS.read_text().splitlines()[1:] if ln.strip()]


def test_corpus_is_vendored_and_big():
    smis = _lines()
    assert len(smis) >= 300
    assert len(set(smis)) == len(smis)


def test_corpus_contract_invariants():
    for smi in _lines():
        a = RxnGraph(smi).arrays
        assert a.node_feats.shape[1] == 78, smi
        assert a.edge_feats.shape[1] == 14, smi
        e = len(a.senders)
        assert e % 2 == 0, smi
        rev = a.rev_edge_index
        # adjacent pair layout + involution (the reference's consecutive
        # pair-flip invariant, GNN.py:136-138, as explicit indices)
        np.testing.assert_array_equal(rev, np.arange(e) ^ 1, err_msg=smi)
        np.testing.assert_array_equal(a.senders[rev], a.receivers,
                                      err_msg=smi)


@pytest.mark.skipif(not native.available(),
                    reason="native toolchain unavailable")
def test_corpus_python_cpp_bit_parity():
    for smi in _lines():
        a = RxnGraph(smi).arrays
        b = native.featurize(smi, "rxn")
        np.testing.assert_array_equal(a.senders, b.senders, err_msg=smi)
        np.testing.assert_array_equal(a.receivers, b.receivers, err_msg=smi)
        np.testing.assert_array_equal(a.rev_edge_index, b.rev_edge_index,
                                      err_msg=smi)
        np.testing.assert_array_equal(a.node_feats, b.node_feats,
                                      err_msg=smi)
        np.testing.assert_array_equal(a.edge_feats, b.edge_feats,
                                      err_msg=smi)


# -- drift-check machinery (no rdkit in this image) ---------------------------

def _self_backend(smi):
    a = RxnGraph(smi).arrays
    return a.node_feats, a.edge_feats, a.senders, a.receivers


def _drifted_backend(smi):
    x, e, s, r = _self_backend(smi)
    x = x.copy()
    x[:, 20] = 1.0 - x[:, 20]   # flip one degree one-hot everywhere
    return x, e, s, r


def test_verify_corpus_passes_on_agreement():
    rep = verify_corpus(str(CORPUS), backend=_self_backend, limit=25)
    assert rep["checked"] == 25 and rep["mismatches"] == 0


def test_verify_corpus_fails_loudly_on_drift():
    with pytest.raises(FeaturizerDrift, match="node features"):
        verify_corpus(str(CORPUS), backend=_drifted_backend, limit=5)


def test_rdkit_gate_reports_unavailable_here():
    assert rdkit_available() is False  # this image has no rdkit; on a
    # connected host the runbook runs the real pass automatically
