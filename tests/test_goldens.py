"""Golden featurization fixtures: the demo set's CGR feature arrays are
checked into the repo (tests/goldens_demo_features.npz); any change to the
chem stack (Python or C++) that shifts feature semantics fails here
(SURVEY.md §4a golden-parity strategy)."""

from pathlib import Path

import numpy as np
import pytest

from cgr_mpnn_3d_tpu import native
from cgr_mpnn_3d_tpu.chem import RxnGraph

HERE = Path(__file__).resolve().parent
DEMO = HERE.parent / "examples" / "demo.csv"
GOLDEN = HERE / "goldens_demo_features.npz"

ROWS = [l.split(",")[0] for l in DEMO.read_text().splitlines()[1:]]


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


def test_python_featurizer_matches_goldens(golden):
    for i, smi in enumerate(ROWS):
        g = RxnGraph(smi).arrays
        np.testing.assert_allclose(g.node_feats, golden[f"node_{i}"],
                                   rtol=1e-6, atol=1e-6, err_msg=smi)
        np.testing.assert_allclose(g.edge_feats, golden[f"edge_{i}"],
                                   rtol=1e-6, atol=1e-6, err_msg=smi)
        np.testing.assert_array_equal(g.senders, golden[f"send_{i}"])
        np.testing.assert_array_equal(g.receivers, golden[f"recv_{i}"])


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_native_featurizer_matches_goldens(golden):
    for i, smi in enumerate(ROWS):
        g = native.featurize(smi, "rxn")
        np.testing.assert_allclose(g.node_feats, golden[f"node_{i}"],
                                   rtol=1e-6, atol=1e-6, err_msg=smi)
        np.testing.assert_allclose(g.edge_feats, golden[f"edge_{i}"],
                                   rtol=1e-6, atol=1e-6, err_msg=smi)
