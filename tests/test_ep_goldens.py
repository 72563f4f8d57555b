"""Edge-partitioned path directly against the REFERENCE model's goldens.

tests/test_ep_pack.py proves the EP path matches our single-device model,
and tests/test_reference_goldens.py proves that model matches the actual
reference (GNN.py run live under torch).  This closes the loop without the
transitive hop: the distributed forward's predictions on a 4-shard mesh are
compared straight to the reference's captured outputs — for the XLA EP ops
on every config (incl. SiLU/mean/learnable-skip) and for the FUSED kernel
path (conv-stack / fused_conv_layer_r + pooled readout, interpret mode) on
the ReLU+add configs it covers.

Also guards the LPT ownership balance: shard edge loads must stay within
2x of each other on a normal batch (regression guard for the
whole-graph-first assignment, parallel/ep_pack.py).
"""

import numpy as np
import pytest

import jax

from cgr_mpnn_3d_tpu.data.synthetic import synthetic_graphs
from cgr_mpnn_3d_tpu.parallel import P, make_mesh, pack_shard_edges
from cgr_mpnn_3d_tpu.parallel.ep_pack import ep_pack_forward

from test_reference_goldens import GOLDENS, _rebuild

CASES = ["demo_flagship", "demo_defaults", "demo_3d_skip",
         "synth_defaults_relu", "synth_silu_mean"]


def _ep_preds(params, graphs, cfg, n_ep=4):
    labels = [0.0] * len(graphs)
    b, espec = pack_shard_edges(graphs, labels, n_ep, te=64, tn=32)
    mesh = make_mesh(n_dp=1, n_ep=n_ep, devices=jax.devices()[:n_ep])
    pspec = jax.tree_util.tree_map(lambda _: P("ep"), b)

    def fwd(bb):
        local = jax.tree_util.tree_map(lambda v: v[0], bb)
        _, preds = ep_pack_forward(params, local, cfg, espec, axis="ep")
        return preds

    sm = jax.jit(jax.shard_map(fwd, mesh=mesh, in_specs=(pspec,),
                               out_specs=P(), check_vma=False))
    return np.asarray(sm(b))[:len(graphs)]


@pytest.mark.skipif(not GOLDENS.exists(), reason="goldens not vendored")
@pytest.mark.parametrize("case", CASES)
def test_ep_matches_reference_goldens(case):
    with np.load(GOLDENS, allow_pickle=True) as z:
        params, graphs, cfg, acts = _rebuild(z, case)
    got = _ep_preds(params, graphs, cfg)
    np.testing.assert_allclose(got, acts["preds"].reshape(-1),
                               rtol=1e-4, atol=1e-4, err_msg=case)


@pytest.mark.skipif(not GOLDENS.exists(), reason="goldens not vendored")
@pytest.mark.parametrize("case", ["demo_flagship", "demo_defaults",
                                  "demo_3d_skip", "synth_defaults_relu"])
def test_ep_fused_kernels_match_reference_goldens(case):
    from dataclasses import replace
    with np.load(GOLDENS, allow_pickle=True) as z:
        params, graphs, cfg, acts = _rebuild(z, case)
    assert cfg.activation == "ReLU" and cfg.aggr == "add"
    cfgp = replace(cfg, use_pallas=True, pallas_interpret=True)
    got = _ep_preds(params, graphs, cfgp)
    np.testing.assert_allclose(got, acts["preds"].reshape(-1),
                               rtol=1e-4, atol=1e-4, err_msg=case)


def test_lpt_ownership_balances_shards():
    rng = np.random.default_rng(0)
    graphs = synthetic_graphs(64, rng, node_feat_dim=20)
    b, espec = pack_shard_edges(graphs, [0.0] * len(graphs), 4,
                                te=64, tn=32)
    # no graph here exceeds an even shard share -> zero cut by construction
    assert all(c == 0 for c in espec.caps)
    loads = [(np.asarray(b.senders[k]) < espec.pn).sum() for k in range(4)]
    assert min(loads) > 0 and max(loads) <= 2 * min(loads), loads