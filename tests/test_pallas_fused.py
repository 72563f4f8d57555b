"""Fused D-MPNN layer kernel tests (interpret mode): fwd/bwd equivalence
with the unfused reference math, dropout determinism, learnable skip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
from cgr_mpnn_3d_tpu.ops.pallas_fused import FusedConvSpec, fused_conv_layer
from cgr_mpnn_3d_tpu.ops.pallas_ops import build_idx_t
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
    idx_t = build_idx_t(jnp.asarray(batch.edge_nbr),
                        jnp.asarray(batch.rev), spec.p)
    return spec, batch, idx_t, batch.edge_nbr.shape[1]


def _ref_layer(h, h0, batch, w, b, skip):
    norm = jnp.ones((h.shape[0],), jnp.float32)
    t = dmpnn_messages(h, batch.edge_nbr, batch.rev, batch.edge_nbr_rev,
                       norm)
    return jax.nn.relu(t @ w + b + skip * h0)


class TestFusedLayer:
    def test_fwd_matches_reference(self, packed):
        spec, batch, idx_t, D = packed
        rng = np.random.default_rng(0)
        ET, H = spec.total_edges, 16
        h = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
        h0 = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((H, H)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
        fspec = FusedConvSpec(p=spec.p, d_nbr=D, mat_dtype=jnp.float32,
                              interpret=True)
        got = fused_conv_layer(fspec, h, h0, idx_t,
                               w, b, jnp.ones(()), jnp.zeros((), jnp.int32))
        expect = _ref_layer(h, h0, batch, w, b, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)

    def test_bwd_matches_reference(self, packed):
        spec, batch, idx_t, D = packed
        rng = np.random.default_rng(1)
        ET, H = spec.total_edges, 16
        h = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
        h0 = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((H, H)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
        skip = jnp.asarray(0.7, jnp.float32)
        cot = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
        fspec = FusedConvSpec(p=spec.p, d_nbr=D, mat_dtype=jnp.float32,
                              interpret=True, learnable_skip=True)

        def loss_fused(h_, h0_, w_, b_, s_):
            out = fused_conv_layer(fspec, h_, h0_, idx_t, w_, b_, s_,
                                   jnp.zeros((), jnp.int32))
            return jnp.sum(out * cot)

        def loss_ref(h_, h0_, w_, b_, s_):
            return jnp.sum(_ref_layer(h_, h0_, batch, w_, b_, s_) * cot)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(h, h0, w, b, skip)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(h, h0, w, b, skip)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)

    def test_dropout_deterministic_and_scaled(self, packed):
        spec, batch, idx_t, D = packed
        rng = np.random.default_rng(2)
        ET, H = spec.total_edges, 16
        h = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
        h0 = jnp.zeros((ET, H), jnp.float32)
        w = jnp.eye(H, dtype=jnp.float32)
        b = jnp.zeros(H, jnp.float32)
        fspec = FusedConvSpec(p=spec.p, d_nbr=D, dropout_p=0.5, train=True,
                              mat_dtype=jnp.float32, interpret=True)
        seed = jnp.asarray(42, jnp.int32)
        o1 = np.asarray(fused_conv_layer(fspec, h, h0, idx_t,
                                         w, b, jnp.ones(()), seed))
        o2 = np.asarray(fused_conv_layer(fspec, h, h0, idx_t,
                                         w, b, jnp.ones(()), seed))
        np.testing.assert_array_equal(o1, o2)  # same seed -> same mask
        o3 = np.asarray(fused_conv_layer(fspec, h, h0, idx_t,
                                         w, b, jnp.ones(()),
                                         jnp.asarray(43, jnp.int32)))
        assert not np.array_equal(o1, o3)
        # dropped entries are exactly zero; kept are scaled by 2
        nodrop = np.asarray(fused_conv_layer(
            FusedConvSpec(p=spec.p, d_nbr=D, mat_dtype=jnp.float32,
                          interpret=True),
            h, h0, idx_t, w, b, jnp.ones(()), seed))
        kept = o1 != 0
        np.testing.assert_allclose(o1[kept], 2.0 * nodrop[kept], rtol=1e-5)

    def test_full_model_fused_matches_xla(self, packed):
        spec, batch, idx_t, D = packed
        cfg_x = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                              depth=3, hidden_sizes=(16,) * 3,
                              dropout_ps=(0.0,) * 3)
        cfg_f = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                              depth=3, hidden_sizes=(16,) * 3,
                              dropout_ps=(0.0,) * 3, use_pallas=True,
                              pallas_interpret=True)
        params = init_params(jax.random.PRNGKey(0), cfg_x)
        y = jnp.asarray(batch.labels)
        m = jnp.asarray(batch.graph_mask)

        p_x = np.asarray(apply(params, batch, cfg_x))
        p_f = np.asarray(apply(params, batch, cfg_f, spec))
        mask = np.asarray(m) > 0
        np.testing.assert_allclose(p_f[mask], p_x[mask], rtol=1e-4,
                                   atol=1e-4)

        def loss(p, cfg, s):
            pred = apply(p, batch, cfg, s)
            return jnp.sum(m * (pred - y) ** 2)

        g_x = jax.tree_util.tree_leaves(jax.grad(loss)(params, cfg_x, None))
        g_f = jax.tree_util.tree_leaves(jax.grad(loss)(params, cfg_f, spec))
        for a, b in zip(g_x, g_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)
