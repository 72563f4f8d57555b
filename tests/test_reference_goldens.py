"""Per-layer parity vs the ACTUAL reference model (GNN.py:76-145).

tests/goldens/reference_gnn.npz is produced by tools/dump_reference_goldens.py,
which imports /root/reference/cgr_mpnn_3D/models/GNN.py *unmodified* under
torch-CPU (only the two torch_geometric symbols it uses are stood in) and
captures every intermediate exactly as the reference consumes it.  Here the
same inputs + parameters run through this repo's apply(capture=True) and every
captured activation must allclose the reference's.

A second test regenerates the goldens live (subprocess, skipped when torch is
unavailable) so the vendored file can never drift from the dump script.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem.featurize import GraphArrays
from cgr_mpnn_3d_tpu.data import PackSpec, pack_graphs
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply

REPO = Path(__file__).resolve().parent.parent
GOLDENS = REPO / "tests" / "goldens" / "reference_gnn.npz"
TOL = dict(rtol=1e-4, atol=1e-4)


def _cases(z):
    return sorted({k.split("/")[0] for k in z.files})


def _rebuild(z, case):
    """goldens -> (our params pytree, GraphArrays list, cfg, activations)."""
    depth, hidden, skip = (int(v) for v in z[f"{case}/meta"])
    mstr = [str(s) for s in z[f"{case}/meta_str"]]
    act_name, aggr = mstr[0], mstr[1]
    pooling = mstr[2] if len(mstr) > 2 else "add"

    params = {
        "edge_init": {"w": z[f"{case}/param/edge_init.w"],
                      "b": z[f"{case}/param/edge_init.b"]},
        "convs": [{"w": z[f"{case}/param/convs.{l}.w"],
                   "b": z[f"{case}/param/convs.{l}.b"]}
                  for l in range(depth)],
        "edge_to_node": {"w": z[f"{case}/param/edge_to_node.w"],
                         "b": z[f"{case}/param/edge_to_node.b"]},
        "ffn": {"w": z[f"{case}/param/ffn.w"],
                "b": z[f"{case}/param/ffn.b"]},
    }
    if skip:
        params["skip_weights"] = [
            np.asarray(z[f"{case}/param/skip_weights.{l}"])
            for l in range(depth)]

    x, e = z[f"{case}/in/x"], z[f"{case}/in/edge_attr"]
    snd, rcv = z[f"{case}/in/senders"], z[f"{case}/in/receivers"]
    n_nodes, n_edges = z[f"{case}/in/n_nodes"], z[f"{case}/in/n_edges"]
    graphs = []
    noff = eoff = 0
    for nn, ne in zip(n_nodes, n_edges):
        nn, ne = int(nn), int(ne)
        graphs.append(GraphArrays(
            node_feats=x[noff:noff + nn],
            edge_feats=e[eoff:eoff + ne],
            senders=(snd[eoff:eoff + ne] - noff).astype(np.int32),
            receivers=(rcv[eoff:eoff + ne] - noff).astype(np.int32),
            rev_edge_index=(np.arange(ne, dtype=np.int32) ^ 1)))
        noff += nn
        eoff += ne

    cfg = CGRMPNNConfig(
        num_node_features=x.shape[1], num_edge_features=e.shape[1],
        depth=depth, hidden_sizes=(hidden,) * depth,
        dropout_ps=(0.0,) * depth,
        activation={"relu": "ReLU", "gelu": "GELU",
                    "silu": "SiLU"}[act_name.lower()],
        aggr=aggr, pooling=pooling, use_learnable_skip=bool(skip))
    acts = {k.split("/", 2)[2]: z[k] for k in z.files
            if k.startswith(f"{case}/act/")}
    return params, graphs, cfg, acts


def _pack(graphs):
    E = sum(g.num_edges for g in graphs)
    N = sum(g.num_nodes for g in graphs)
    B = len(graphs)
    deg = max(int(np.bincount(g.receivers).max()) for g in graphs
              if g.num_edges)
    dn = max(g.num_nodes for g in graphs)
    spec = PackSpec(te=E + 2, tn=N + 2, tb=B + 1, d=deg + 1, dn=dn, p=1)
    return pack_graphs(graphs, [0.0] * B, spec), E, N, B


@pytest.mark.skipif(not GOLDENS.exists(), reason="goldens not vendored")
class TestReferenceGoldens:
    @pytest.fixture(scope="class")
    def z(self):
        with np.load(GOLDENS, allow_pickle=True) as z:
            yield z

    def test_case_inventory(self, z):
        cases = _cases(z)
        # synthetic sweeps every config axis; demo cases cover real
        # chemistry incl. a MACE-widened node-feature block
        assert {"synth_defaults_relu", "synth_flagship_d4",
                "synth_gelu_skip", "synth_silu_mean", "synth_relu_meanpool",
                "demo_flagship", "demo_defaults", "demo_3d_skip"} <= set(cases)

    @pytest.mark.parametrize("case", [
        "synth_defaults_relu", "synth_flagship_d4", "synth_gelu_skip",
        "synth_silu_mean", "synth_relu_meanpool", "demo_flagship",
        "demo_defaults", "demo_3d_skip"])
    def test_per_layer_allclose(self, z, case):
        params, graphs, cfg, gold = _rebuild(z, case)
        batch, E, N, B = _pack(graphs)
        out, acts = apply(params, batch, cfg, capture=True)
        out, acts = np.asarray(out), {k: np.asarray(v)
                                      for k, v in acts.items()}

        np.testing.assert_allclose(acts["h0"][:E], gold["h0"], **TOL,
                                   err_msg=f"{case}: h0 (GNN.py:84-87)")
        for l in range(cfg.depth):
            np.testing.assert_allclose(
                acts[f"h_{l}"][:E], gold[f"h_{l}"], **TOL,
                err_msg=f"{case}: conv layer {l} (GNN.py:90-102)")
        np.testing.assert_allclose(acts["s"][:N], gold["s"], **TOL,
                                   err_msg=f"{case}: readout sums "
                                           f"(GNN.py:105, conv reuse)")
        np.testing.assert_allclose(acts["h_node"][:N], gold["h_node"],
                                   **TOL, err_msg=f"{case}: edge_to_node")
        np.testing.assert_allclose(acts["pooled"][:B], gold["pooled"],
                                   **TOL, err_msg=f"{case}: pooling")
        np.testing.assert_allclose(out[:B], gold["preds"], **TOL,
                                   err_msg=f"{case}: predictions")


def _torch_available():
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _torch_available(), reason="torch unavailable")
@pytest.mark.skipif(not Path("/root/reference").exists(),
                    reason="reference checkout unavailable")
def test_goldens_regenerate_bit_identical(tmp_path):
    """The vendored goldens are exactly what the dump script produces today
    (same reference code, same seeds) — no silent drift."""
    out = tmp_path / "regen.npz"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "dump_reference_goldens.py"),
         "--out", str(out)], check=True, cwd=str(REPO),
        capture_output=True, text=True, timeout=300)
    with np.load(GOLDENS, allow_pickle=True) as a, \
            np.load(out, allow_pickle=True) as b:
        assert set(a.files) == set(b.files)
        for k in a.files:
            if a[k].dtype.kind in "OU":
                assert list(a[k]) == list(b[k]), k
            else:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.skipif(not GOLDENS.exists(), reason="goldens not vendored")
class TestPallasVsReferenceGoldens:
    """The Pallas kernel path (interpret mode on CPU) checked DIRECTLY
    against the reference's activations — not just against the XLA path —
    for EVERY golden case: the kernels are activation- AND aggregation-
    general since r4 (relu/silu/gelu x add/mean), so synth_silu_mean runs
    through the one-kernel path too."""

    @pytest.mark.parametrize("case", [
        "synth_defaults_relu", "synth_flagship_d4", "synth_gelu_skip",
        "synth_silu_mean", "synth_relu_meanpool", "demo_flagship",
        "demo_defaults", "demo_3d_skip"])
    def test_pallas_predictions_match_reference(self, case):
        from dataclasses import replace
        with np.load(GOLDENS, allow_pickle=True) as z:
            params, graphs, cfg, gold = _rebuild(z, case)
        cfg = replace(cfg, use_pallas=True, pallas_interpret=True)
        # Pallas tiles need 128-multiple edge slots / 8-multiple rows
        E = sum(g.num_edges for g in graphs)
        N = sum(g.num_nodes for g in graphs)
        deg = max(int(np.bincount(g.receivers).max()) for g in graphs
                  if g.num_edges)
        dn = max(g.num_nodes for g in graphs)
        r = lambda v, m: -(-v // m) * m
        spec = PackSpec(te=r(E + 2, 128), tn=r(N + 2, 8),
                        tb=r(len(graphs) + 1, 8), d=deg + 1, dn=dn, p=1)
        batch = pack_graphs(graphs, [0.0] * len(graphs), spec)
        out = np.asarray(apply(params, batch, cfg, spec))
        B = len(graphs)
        np.testing.assert_allclose(out[:B], gold["preds"], rtol=2e-4,
                                   atol=2e-4,
                                   err_msg=f"{case}: Pallas vs reference")
