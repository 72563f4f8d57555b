"""Whole-model kernel tests (interpret mode): forward + all parameter
gradients vs the XLA path, dropout replay, learnable skip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params

SMILES = ["CCO>>CC=O", "CC(=O)N>>CC(=O)N", "C=CC=C>>C=CC=C",
          "CCO>C>CCO", "O>C>CO", "N>C>CN", "CC>>CC",
          "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]"]
LABELS = [float(i) for i in range(len(SMILES))]


@pytest.fixture(scope="module")
def packed():
    graphs = [RxnGraph(s).arrays for s in SMILES]
    spec = plan_spec(graphs, te=64, tn=32, tb=8).with_packs(2)
    return spec, pack_graphs(graphs, LABELS, spec)


def _cfgs(depth=3, learnable=False, q=1, act="ReLU", aggr="add",
          pooling="add"):
    kw = dict(num_node_features=78, num_edge_features=14, depth=depth,
              hidden_sizes=(16,) * depth, dropout_ps=(0.0,) * depth,
              use_learnable_skip=learnable, activation=act, aggr=aggr,
              pooling=pooling)
    cfg_x = CGRMPNNConfig(**kw)
    cfg_m = CGRMPNNConfig(**kw, use_pallas=True, pallas_interpret=True,
                          pallas_sub_packs=q)
    assert cfg_m.fuse_whole_model
    return cfg_x, cfg_m


class TestWholeModelKernel:
    @pytest.mark.parametrize("q,act,aggr,pooling", [
        (1, "ReLU", "add", "add"), (2, "ReLU", "add", "add"),
        (1, "SiLU", "add", "add"), (1, "GELU", "add", "add"),
        (1, "ReLU", "mean", "add"), (2, "SiLU", "mean", "add"),
        (1, "ReLU", "add", "mean"), (2, "ReLU", "mean", "mean")])
    def test_forward_matches(self, packed, q, act, aggr, pooling):
        spec, batch = packed
        cfg_x, cfg_m = _cfgs(q=q, act=act, aggr=aggr, pooling=pooling)
        params = init_params(jax.random.PRNGKey(0), cfg_x)
        p_x = np.asarray(apply(params, batch, cfg_x))
        p_m = np.asarray(apply(params, batch, cfg_m, spec))
        mask = np.asarray(batch.graph_mask) > 0
        np.testing.assert_allclose(p_m[mask], p_x[mask], rtol=1e-4,
                                   atol=1e-4)

    @pytest.mark.parametrize("q", [1, 2])
    def test_all_param_grads_match(self, packed, q):
        spec, batch = packed
        cfg_x, cfg_m = _cfgs(learnable=True, q=q)
        params = init_params(jax.random.PRNGKey(1), cfg_x)
        params["skip_weights"] = [jnp.asarray(v) for v in (0.8, -0.3, 1.2)]
        y = jnp.asarray(batch.labels)
        m = jnp.asarray(batch.graph_mask)

        def loss(p, cfg, s):
            pred = apply(p, batch, cfg, s)
            return jnp.sum(m * (pred - y) ** 2)

        g_x = jax.grad(loss)(params, cfg_x, None)
        g_m = jax.grad(loss)(params, cfg_m, spec)
        flat_x = jax.tree_util.tree_flatten_with_path(g_x)[0]
        flat_m = jax.tree_util.tree_leaves(g_m)
        assert len(flat_x) == len(flat_m)
        for (path, a), b in zip(flat_x, flat_m):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3,
                err_msg=jax.tree_util.keystr(path))

    def test_train_dropout_runs_and_differs(self, packed):
        spec, batch = packed
        kw = dict(num_node_features=78, num_edge_features=14, depth=2,
                  hidden_sizes=(16, 16), dropout_ps=(0.4, 0.4),
                  use_pallas=True, pallas_interpret=True)
        cfg = CGRMPNNConfig(**kw)
        params = init_params(jax.random.PRNGKey(2), cfg)
        p_eval = np.asarray(apply(params, batch, cfg, spec, train=False))
        p_tr1 = np.asarray(apply(params, batch, cfg, spec, train=True,
                                 rng=jax.random.PRNGKey(3)))
        p_tr2 = np.asarray(apply(params, batch, cfg, spec, train=True,
                                 rng=jax.random.PRNGKey(3)))
        p_tr3 = np.asarray(apply(params, batch, cfg, spec, train=True,
                                 rng=jax.random.PRNGKey(4)))
        mask = np.asarray(batch.graph_mask) > 0
        np.testing.assert_allclose(p_tr1[mask], p_tr2[mask], rtol=1e-6)
        assert not np.allclose(p_tr1[mask], p_eval[mask])
        assert not np.allclose(p_tr1[mask], p_tr3[mask])

    @pytest.mark.parametrize("q,act,aggr,pooling", [
        (1, "ReLU", "add", "add"), (2, "ReLU", "add", "add"),
        (1, "SiLU", "add", "add"), (1, "GELU", "add", "add"),
        (1, "ReLU", "mean", "add"), (2, "SiLU", "mean", "add"),
        (1, "ReLU", "add", "mean"), (2, "SiLU", "mean", "mean")])
    def test_fused_train_step_matches_autodiff(self, packed, q, act, aggr,
                                               pooling):
        from cgr_mpnn_3d_tpu.models.cgr_mpnn import (
            fused_train_value_and_grad, supports_fused_train)
        from cgr_mpnn_3d_tpu.train import sse_loss
        spec, batch = packed
        cfg_x, cfg_m = _cfgs(learnable=True, q=q, act=act, aggr=aggr,
                             pooling=pooling)
        assert supports_fused_train(cfg_m)
        params = init_params(jax.random.PRNGKey(9), cfg_x)
        params["skip_weights"] = [jnp.asarray(v) for v in (1.0, 0.4, -0.6)]

        sse_f, g_f = fused_train_value_and_grad(params, batch, cfg_m, spec,
                                                None)
        sse_a, g_a = jax.value_and_grad(sse_loss)(params, batch, cfg_x,
                                                  False, None)
        np.testing.assert_allclose(float(sse_f), float(sse_a), rtol=1e-4)
        flat_a = jax.tree_util.tree_flatten_with_path(g_a)[0]
        flat_f = jax.tree_util.tree_leaves(g_f)
        assert len(flat_a) == len(flat_f)
        for (path, a), b in zip(flat_a, flat_f):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3,
                err_msg=jax.tree_util.keystr(path))

    def test_train_grads_finite_with_dropout(self, packed):
        spec, batch = packed
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.3, 0.3), use_pallas=True,
                            pallas_interpret=True)
        params = init_params(jax.random.PRNGKey(5), cfg)
        y = jnp.asarray(batch.labels)
        m = jnp.asarray(batch.graph_mask)
        g = jax.grad(lambda p: jnp.sum(
            m * (apply(p, batch, cfg, spec, train=True,
                       rng=jax.random.PRNGKey(6)) - y) ** 2))(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
