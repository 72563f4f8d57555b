"""Pallas one-hot SpMM kernel tests (interpret mode on CPU): transposed
kernel vs gather reference for every op instance, gradients through the
generic custom VJP, and full-model forward/grad equivalence XLA vs Pallas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
from cgr_mpnn_3d_tpu.ops.dispatch import (SpmmMeta, build_model_indices,
                                          spmm_t)
from cgr_mpnn_3d_tpu.ops.pallas_ops import (build_idx_t, onehot_spmm_ref,
                                            onehot_spmm_t)
from cgr_mpnn_3d_tpu.ops.segment import dmpnn_messages

SMILES = ["CCO>>CC=O", "CC(=O)N>>CC(=O)N", "C=CC=C>>C=CC=C",
          "CCO>C>CCO", "O>C>CO", "N>C>CN", "CC>>CC",
          "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]"]
LABELS = [float(i) for i in range(len(SMILES))]


@pytest.fixture(scope="module")
def packed():
    graphs = [RxnGraph(s).arrays for s in SMILES]
    spec = plan_spec(graphs, te=64, tn=32, tb=8).with_packs(2)
    batch = pack_graphs(graphs, LABELS, spec)
    return graphs, spec, batch


class TestKernel:
    def test_all_op_instances(self, packed):
        graphs, spec, batch = packed
        rng = np.random.default_rng(0)
        ET, NT = spec.total_edges, spec.total_nodes
        H = 16
        h_e = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
        h_n = jnp.asarray(rng.standard_normal((NT, H)), jnp.float32)
        h_g = jnp.asarray(rng.standard_normal((spec.total_graphs, H)),
                          jnp.float32)
        cases = [
            (batch.edge_nbr, batch.rev, h_e),            # messages fwd
            (batch.edge_nbr_rev, batch.rev, h_e),        # messages bwd
            (batch.node_inc, None, h_e),                 # incoming fwd
            (np.asarray(batch.receivers)[:, None], None, h_n),  # incoming bwd
            (np.asarray(batch.senders)[:, None], None, h_n),    # gather fwd
            (batch.node_out, None, h_e),                 # gather bwd
            (batch.graph_nodes, None, h_n),              # pool fwd
            (np.asarray(batch.graph_of_node)[:, None], None, h_g),  # pool bwd
        ]
        for idx, sign, src in cases:
            idx = jnp.asarray(idx)
            sign_j = jnp.asarray(sign) if sign is not None else None
            idx_t = build_idx_t(idx, sign_j, spec.p)
            got = onehot_spmm_t(idx_t, src, spec.p, idx.shape[1],
                                sign is not None, mat_dtype=jnp.float32,
                                interpret=True)
            expect = onehot_spmm_ref(idx, sign_j, src)
            np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                       rtol=1e-5, atol=1e-5)

    def test_custom_vjp_grad(self, packed):
        graphs, spec, batch = packed
        rng = np.random.default_rng(1)
        ET = spec.total_edges
        D = batch.edge_nbr.shape[1]
        h = jnp.asarray(rng.standard_normal((ET, 16)), jnp.float32)
        cot = jnp.asarray(rng.standard_normal((ET, 16)), jnp.float32)
        norm = jnp.ones((ET,), jnp.float32)
        idxs = build_model_indices(batch, spec.p)
        meta = lambda d, s: SpmmMeta(d, s, jnp.float32, jnp.float32, True)

        g1 = jax.grad(lambda v: jnp.sum(spmm_t(
            spec.p, meta(D, True), meta(D, True), v,
            idxs.msg_fwd, idxs.msg_bwd) * cot))(h)
        g2 = jax.grad(lambda v: jnp.sum(dmpnn_messages(
            v, batch.edge_nbr, batch.rev, batch.edge_nbr_rev, norm)
            * cot))(h)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-5)


class TestModelEquivalence:
    def test_forward_and_grads_match_xla_path(self, packed):
        graphs, spec, batch = packed
        cfg_x = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                              depth=2, hidden_sizes=(16, 16),
                              dropout_ps=(0.0, 0.0), activation="SiLU")
        cfg_p = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                              depth=2, hidden_sizes=(16, 16),
                              dropout_ps=(0.0, 0.0), activation="SiLU",
                              use_pallas=True, pallas_interpret=True)
        params = init_params(jax.random.PRNGKey(0), cfg_x)
        y = jnp.asarray(batch.labels)
        m = jnp.asarray(batch.graph_mask)

        p_x = np.asarray(apply(params, batch, cfg_x))
        p_p = np.asarray(apply(params, batch, cfg_p, spec))
        mask = np.asarray(m) > 0
        np.testing.assert_allclose(p_p[mask], p_x[mask], rtol=1e-4, atol=1e-4)

        def loss(p, cfg, spec_):
            pred = apply(p, batch, cfg, spec_)
            return jnp.sum(m * (pred - y) ** 2)

        g_x = jax.grad(loss)(params, cfg_x, None)
        g_p = jax.grad(loss)(params, cfg_p, spec)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)
