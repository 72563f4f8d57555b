"""Per-layer activation parity (SURVEY.md §4a): capture mode must expose
h0, per-layer h, readout s, node states and pooled activations that match
the independent numpy scatter-loop reference layer by layer."""

import jax
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params

SMILES = ["CCO>>CC=O", "CC(=O)N>>CC(=O)N", "CC>>CC"]
LABELS = [1.0, 2.0, 3.0]


def numpy_layer_dump(params, g, cfg):
    """Reference layer activations for ONE graph (torch semantics,
    GNN.py:76-110, eval mode)."""
    relu = lambda v: np.maximum(v, 0.0)
    lin = lambda p, v: v @ np.asarray(p["w"]) + np.asarray(p["b"])
    x, e = g.node_feats, g.edge_feats
    src, dst = g.senders, g.receivers
    E, N = len(src), x.shape[0]
    acts = {}
    h = acts["h0"] = relu(lin(params["edge_init"],
                              np.concatenate([x[src], e], 1)))
    h0 = h
    for l in range(cfg.depth):
        a = np.zeros((N, h.shape[1]), np.float32)
        for ei in range(E):
            a[dst[ei]] += h[ei]
        rev = h.reshape(E // 2, 2, -1)[:, ::-1, :].reshape(E, -1)
        h = relu(lin(params["convs"][l], a[src] - rev) + h0)
        acts[f"h_{l}"] = h
    s = np.zeros((N, h.shape[1]), np.float32)
    for ei in range(E):
        s[dst[ei]] += h[ei]
    acts["s"] = s
    acts["h_node"] = relu(lin(params["edge_to_node"],
                              np.concatenate([x, s], 1)))
    acts["pooled"] = acts["h_node"].sum(axis=0, keepdims=True)
    return acts


@pytest.mark.parametrize("use_pallas", [False, True])
def test_layerwise_capture_parity(use_pallas):
    graphs = [RxnGraph(s).arrays for s in SMILES]
    spec = plan_spec(graphs, te=64, tn=32, tb=4).with_packs(1)
    batch = pack_graphs(graphs, LABELS, spec)
    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=2, hidden_sizes=(16, 16),
                        dropout_ps=(0.0, 0.0), use_pallas=use_pallas,
                        pallas_interpret=use_pallas)
    params = init_params(jax.random.PRNGKey(0), cfg)
    _, acts = apply(params, batch, cfg, spec, capture=True)

    # graph 0 occupies the first rows of each array
    g = graphs[0]
    ref = numpy_layer_dump(params, g, cfg)
    ne, nn = g.num_edges, g.num_nodes
    for key in ["h0", "h_0", "h_1"]:
        np.testing.assert_allclose(np.asarray(acts[key])[:ne],
                                   ref[key], rtol=2e-4, atol=2e-4,
                                   err_msg=key)
    np.testing.assert_allclose(np.asarray(acts["s"])[:nn], ref["s"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(acts["h_node"])[:nn],
                               ref["h_node"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(acts["pooled"])[0],
                               ref["pooled"][0], rtol=2e-4, atol=2e-4)
