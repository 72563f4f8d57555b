"""Conv-stack kernel tests (interpret mode): stack vs per-layer composition,
gradients (h0/W/b/skips), dropout replay determinism, model integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
from cgr_mpnn_3d_tpu.ops.pallas_fused import FusedConvSpec, fused_conv_layer
from cgr_mpnn_3d_tpu.ops.pallas_ops import build_idx_t
from cgr_mpnn_3d_tpu.ops.pallas_stack import ConvStackSpec, fused_conv_stack

SMILES = ["CCO>>CC=O", "CC(=O)N>>CC(=O)N", "C=CC=C>>C=CC=C",
          "CCO>C>CCO", "O>C>CO", "N>C>CN", "CC>>CC",
          "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]"]
LABELS = [float(i) for i in range(len(SMILES))]
DEPTH = 3


@pytest.fixture(scope="module")
def setup():
    graphs = [RxnGraph(s).arrays for s in SMILES]
    spec = plan_spec(graphs, te=64, tn=32, tb=8).with_packs(2)
    batch = pack_graphs(graphs, LABELS, spec)
    idx_t = build_idx_t(jnp.asarray(batch.edge_nbr),
                        jnp.asarray(batch.rev), spec.p)
    D = batch.edge_nbr.shape[1]
    rng = np.random.default_rng(0)
    ET, H = spec.total_edges, 16
    h0 = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((DEPTH, H, H)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((DEPTH, H)) * 0.1, jnp.float32)
    skips = jnp.asarray([1.0, 0.5, -0.7], jnp.float32)
    return spec, batch, idx_t, D, h0, w, b, skips


def _per_layer(spec, idx_t, D, h0, w, b, skips, dropout=(0.0,) * DEPTH,
               train=False, seeds=None):
    h = h0
    for l in range(DEPTH):
        fspec = FusedConvSpec(p=spec.p, d_nbr=D, dropout_p=dropout[l],
                              train=train, mat_dtype=jnp.float32,
                              interpret=True, learnable_skip=True)
        seed = seeds[l] if seeds is not None else jnp.zeros((), jnp.int32)
        h = fused_conv_layer(fspec, h, h0, idx_t, w[l], b[l], skips[l], seed)
    return h


class TestConvStack:
    def test_fwd_matches_per_layer(self, setup):
        spec, batch, idx_t, D, h0, w, b, skips = setup
        sspec = ConvStackSpec(p=spec.p, d_nbr=D, depth=DEPTH,
                              dropout_ps=(0.0,) * DEPTH,
                              mat_dtype=jnp.float32, out_dtype=jnp.float32,
                              interpret=True)
        got = fused_conv_stack(sspec, h0, idx_t, w, b, skips,
                               jnp.zeros((DEPTH,), jnp.int32))
        expect = _per_layer(spec, idx_t, D, h0, w, b, skips)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=1e-4, atol=1e-4)

    def test_bwd_matches_per_layer(self, setup):
        spec, batch, idx_t, D, h0, w, b, skips = setup
        rng = np.random.default_rng(1)
        cot = jnp.asarray(rng.standard_normal(h0.shape), jnp.float32)
        sspec = ConvStackSpec(p=spec.p, d_nbr=D, depth=DEPTH,
                              dropout_ps=(0.0,) * DEPTH,
                              mat_dtype=jnp.float32, out_dtype=jnp.float32,
                              interpret=True, learnable_skip=True)

        def loss_stack(h0_, w_, b_, s_):
            out = fused_conv_stack(sspec, h0_, idx_t, w_, b_, s_,
                                   jnp.zeros((DEPTH,), jnp.int32))
            return jnp.sum(out * cot)

        def loss_layers(h0_, w_, b_, s_):
            return jnp.sum(_per_layer(spec, idx_t, D, h0_, w_, b_, s_) * cot)

        g1 = jax.grad(loss_stack, argnums=(0, 1, 2, 3))(h0, w, b, skips)
        g2 = jax.grad(loss_layers, argnums=(0, 1, 2, 3))(h0, w, b, skips)
        for a, e, name in zip(g1, g2, ["dh0", "dw", "db", "dskips"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=2e-3, atol=2e-3, err_msg=name)

    def test_dropout_replay_consistency(self, setup):
        spec, batch, idx_t, D, h0, w, b, skips = setup
        seeds = jnp.asarray([11, 22, 33], jnp.int32)
        drops = (0.3, 0.0, 0.5)
        sspec = ConvStackSpec(p=spec.p, d_nbr=D, depth=DEPTH,
                              dropout_ps=drops, train=True,
                              mat_dtype=jnp.float32, out_dtype=jnp.float32,
                              interpret=True)
        o1 = fused_conv_stack(sspec, h0, idx_t, w, b, skips, seeds)
        # same masks as the per-layer kernel with same seeds
        o2 = _per_layer(spec, idx_t, D, h0, w, b, skips, dropout=drops,
                        train=True, seeds=seeds)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-4, atol=1e-4)
        # gradient with dropout: stack bwd must replay identical masks
        cot = jnp.ones_like(h0)
        g1 = jax.grad(lambda v: jnp.sum(fused_conv_stack(
            sspec, v, idx_t, w, b, skips, seeds) * cot))(h0)
        g2 = jax.grad(lambda v: jnp.sum(_per_layer(
            spec, idx_t, D, v, w, b, skips, dropout=drops, train=True,
            seeds=seeds) * cot))(h0)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-3)

    def test_model_uses_stack_and_matches_xla(self, setup):
        spec, batch, idx_t, D, h0, w, b, skips = setup
        cfg_x = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                              depth=DEPTH, hidden_sizes=(16,) * DEPTH,
                              dropout_ps=(0.0,) * DEPTH)
        cfg_f = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                              depth=DEPTH, hidden_sizes=(16,) * DEPTH,
                              dropout_ps=(0.0,) * DEPTH, use_pallas=True,
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
        for a, e in zip(g_x, g_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=2e-3, atol=2e-3)
