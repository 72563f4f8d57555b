"""Numerics parity: the packed gather-only model vs an independent
scatter-loop reference implementing the torch GNN semantics verbatim
(GNN.py:76-145), plus gradient checks of every custom VJP against plain JAX
autodiff on a naive implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import ChemDataset, PackSpec, pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
from cgr_mpnn_3d_tpu.ops import (dmpnn_messages, gather_nodes,
                                 graph_pool_sum, node_incoming_sum)

SMILES = [
    "CCO>>CC=O",
    "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]",
    "C=CC=C>>C1CC=CC1".replace("C1CC=CC1", "C=CC=C"),  # identity rxn
    "CC(=O)N>>CC(=O)N",
]


def numpy_reference_forward(params, graphs, labels, cfg, extra=None):
    """Torch-semantics forward (GNN.py:76-110) with explicit scatter loops on
    the *unpacked* per-graph arrays; batching = disjoint union like PyG."""
    act = {"ReLU": lambda v: np.maximum(v, 0.0),
           "SiLU": lambda v: v / (1.0 + np.exp(-v)),
           }[cfg.activation]

    def lin(p, v):
        return v @ np.asarray(p["w"]) + np.asarray(p["b"])

    outs = []
    for gi, g in enumerate(graphs):
        x = g.node_feats
        if extra is not None:
            x = np.concatenate([x, extra[gi]], axis=1)
        e = g.edge_feats
        src, dst, rev = g.senders, g.receivers, g.rev_edge_index
        E, N = len(src), x.shape[0]

        h0 = act(lin(params["edge_init"], np.concatenate([x[src], e], 1)))
        h = h0
        for l in range(cfg.depth):
            # a_message = scatter-add of h into receiver nodes (GNN.py:134)
            a = np.zeros((N, h.shape[1]), np.float32)
            for ei in range(E):
                a[dst[ei]] += h[ei]
            # rev_message via the consecutive-pair flip (GNN.py:136-138)
            rev_msg = h.reshape(E // 2, 2, -1)[:, ::-1, :].reshape(E, -1)
            t = a[src] - rev_msg
            h_new = lin(params["convs"][l], t)
            if cfg.use_learnable_skip:
                h = h_new + float(params["skip_weights"][l]) * h0
            else:
                h = h_new + h0
            h = act(h)  # eval mode: no dropout
        # conv-layer reuse readout (GNN.py:105): a_message only
        s = np.zeros((N, h.shape[1]), np.float32)
        for ei in range(E):
            s[dst[ei]] += h[ei]
        hn = act(lin(params["edge_to_node"], np.concatenate([x, s], 1)))
        pooled = hn.sum(axis=0)
        outs.append(float(lin(params["ffn"], pooled[None, :])[0, 0]))
    return np.asarray(outs, np.float32)


@pytest.fixture(scope="module")
def setup():
    graphs = [RxnGraph(s).arrays for s in SMILES]
    labels = [1.0, 2.0, 3.0, 4.0]
    spec = plan_spec(graphs, te=128, tn=64, tb=4).with_packs(2)
    batch = pack_graphs(graphs, labels, spec)
    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=3, hidden_sizes=(32, 32, 32),
                        dropout_ps=(0.1, 0.1, 0.1))
    params = init_params(jax.random.PRNGKey(0), cfg)
    return graphs, labels, spec, batch, cfg, params


class TestForwardParity:
    def test_eval_forward_matches_reference(self, setup):
        graphs, labels, spec, batch, cfg, params = setup
        preds = apply(params, batch, cfg, train=False)
        real = np.nonzero(np.asarray(batch.graph_mask) > 0)[0]
        got = np.asarray(preds)[real]
        expect = numpy_reference_forward(params, graphs, labels, cfg)
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)

    def test_learnable_skip_parity(self, setup):
        graphs, labels, spec, batch, _, _ = setup
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0), use_learnable_skip=True)
        params = init_params(jax.random.PRNGKey(1), cfg)
        params["skip_weights"] = [jnp.asarray(0.5), jnp.asarray(-1.25)]
        preds = np.asarray(apply(params, batch, cfg))
        real = np.nonzero(np.asarray(batch.graph_mask) > 0)[0]
        expect = numpy_reference_forward(params, graphs, labels, cfg)
        np.testing.assert_allclose(preds[real], expect, rtol=2e-4, atol=2e-4)

    def test_silu_parity(self, setup):
        graphs, labels, spec, batch, _, _ = setup
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0), activation="SiLU")
        params = init_params(jax.random.PRNGKey(2), cfg)
        preds = np.asarray(apply(params, batch, cfg))
        real = np.nonzero(np.asarray(batch.graph_mask) > 0)[0]
        expect = numpy_reference_forward(params, graphs, labels, cfg)
        np.testing.assert_allclose(preds[real], expect, rtol=2e-4, atol=2e-4)

    def test_batch_order_independence(self, setup):
        graphs, labels, spec, _, cfg, params = setup
        b1 = pack_graphs(graphs, labels, spec)
        perm = [2, 0, 3, 1]
        b2 = pack_graphs([graphs[i] for i in perm],
                         [labels[i] for i in perm], spec)
        p1 = np.asarray(apply(params, b1, cfg))
        p2 = np.asarray(apply(params, b2, cfg))
        m1 = np.nonzero(np.asarray(b1.graph_mask) > 0)[0]
        m2 = np.nonzero(np.asarray(b2.graph_mask) > 0)[0]
        got1 = {labels[i]: p1[m1[j]] for j, i in enumerate(range(4))}
        got2 = {labels[perm[j]]: p2[m2[j]] for j in range(4)}
        for k in got1:
            np.testing.assert_allclose(got1[k], got2[k], rtol=1e-5, atol=1e-5)

    def test_jit_compiles_once_and_matches(self, setup):
        graphs, labels, spec, batch, cfg, params = setup
        f = jax.jit(lambda p, b: apply(p, b, cfg))
        np.testing.assert_allclose(np.asarray(f(params, batch)),
                                   np.asarray(apply(params, batch, cfg)),
                                   rtol=1e-5, atol=1e-5)


def _naive_forward(params, batch, cfg):
    """Same math with plain jnp.take (+autodiff scatters in bwd) — used as
    the gradient oracle for the custom VJPs."""
    act = jax.nn.relu
    ET = batch.senders.shape[0]

    def ext(h):
        return jnp.concatenate([h, jnp.zeros((1, h.shape[1]), h.dtype)], 0)

    def lin(p, v):
        return v @ p["w"] + p["b"]

    x, e = batch.node_x, batch.edge_attr
    x_src = jnp.take(ext(x), batch.senders, axis=0, mode="clip")
    h0 = act(lin(params["edge_init"], jnp.concatenate([x_src, e], 1)))
    h = h0
    for l in range(cfg.depth):
        he = ext(h)
        t = (jnp.take(he, batch.edge_nbr, axis=0, mode="clip").sum(1)
             - jnp.take(he, batch.rev, axis=0, mode="clip"))
        h = act(lin(params["convs"][l], t) + h0)
    s = jnp.take(ext(h), batch.node_inc, axis=0, mode="clip").sum(1)
    hn = act(lin(params["edge_to_node"], jnp.concatenate([x, s], 1)))
    pooled = jnp.take(ext(hn), batch.graph_nodes, axis=0, mode="clip").sum(1)
    return lin(params["ffn"], pooled)[:, 0]


class TestGradients:
    def test_custom_vjp_matches_autodiff(self, setup):
        graphs, labels, spec, batch, cfg, params = setup
        y = jnp.asarray(batch.labels)
        m = jnp.asarray(batch.graph_mask)

        def loss_custom(p):
            pred = apply(p, batch, cfg)
            return jnp.sum(m * (pred - y) ** 2)

        def loss_naive(p):
            pred = _naive_forward(p, batch, cfg)
            return jnp.sum(m * (pred - y) ** 2)

        l1, g1 = jax.value_and_grad(loss_custom)(params)
        l2, g2 = jax.value_and_grad(loss_naive)(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        flat1 = jax.tree_util.tree_leaves(g1)
        flat2 = jax.tree_util.tree_leaves(g2)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_individual_op_grads(self, setup):
        _, _, spec, batch, _, _ = setup
        rng = np.random.default_rng(0)
        ET = batch.senders.shape[0]
        NT = batch.node_x.shape[0]
        H = 8
        h = jnp.asarray(rng.standard_normal((ET, H)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((NT, H)), jnp.float32)
        norm = jnp.ones((ET,), jnp.float32)

        def ext(v):
            return jnp.concatenate([v, jnp.zeros((1, H), v.dtype)], 0)

        cases = [
            (lambda v: dmpnn_messages(v, batch.edge_nbr, batch.rev,
                                      batch.edge_nbr_rev, norm),
             lambda v: jnp.take(ext(v), batch.edge_nbr, axis=0, mode="clip").sum(1)
             - jnp.take(ext(v), batch.rev, axis=0, mode="clip"), h),
            (lambda v: node_incoming_sum(v, batch.node_inc, batch.receivers),
             lambda v: jnp.take(ext(v), batch.node_inc, axis=0,
                                mode="clip").sum(1), h),
            (lambda v: gather_nodes(v, batch.senders, batch.node_out),
             lambda v: jnp.take(ext(v), batch.senders, axis=0, mode="clip"), x),
            (lambda v: graph_pool_sum(v, batch.graph_nodes,
                                      batch.graph_of_node),
             lambda v: jnp.take(ext(v), batch.graph_nodes, axis=0,
                                mode="clip").sum(1), x),
        ]
        for custom, naive, inp in cases:
            np.testing.assert_allclose(np.asarray(custom(inp)),
                                       np.asarray(naive(inp)),
                                       rtol=1e-5, atol=1e-5)
            cot = jnp.asarray(
                rng.standard_normal(custom(inp).shape), jnp.float32)
            g1 = jax.grad(lambda v: jnp.sum(custom(v) * cot))(inp)
            g2 = jax.grad(lambda v: jnp.sum(naive(v) * cot))(inp)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       rtol=1e-4, atol=1e-4)

    def test_mean_aggr_runs(self, setup):
        graphs, labels, spec, batch, _, _ = setup
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0), aggr="mean")
        params = init_params(jax.random.PRNGKey(3), cfg)
        preds = apply(params, batch, cfg)
        assert np.isfinite(np.asarray(preds)[np.asarray(batch.graph_mask) > 0]).all()

    def test_dropout_train_vs_eval(self, setup):
        graphs, labels, spec, batch, cfg, params = setup
        p_eval = apply(params, batch, cfg, train=False)
        p_train = apply(params, batch, cfg, train=True,
                        rng=jax.random.PRNGKey(7))
        assert not np.allclose(np.asarray(p_eval), np.asarray(p_train))


class TestMoreConfigs:
    def test_mean_aggr_grads_match_autodiff(self, setup):
        graphs, labels, spec, batch, _, _ = setup
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0), aggr="mean")
        params = init_params(jax.random.PRNGKey(4), cfg)
        y = jnp.asarray(batch.labels)
        m = jnp.asarray(batch.graph_mask)

        def loss_custom(p):
            pred = apply(p, batch, cfg)
            return jnp.sum(m * (pred - y) ** 2)

        # oracle: same math via plain jnp (autodiff scatters in bwd)
        ET = batch.senders.shape[0]

        def ext(h):
            return jnp.concatenate([h, jnp.zeros((1, h.shape[1]),
                                                 h.dtype)], 0)

        in_deg = (jnp.asarray(batch.node_inc) < ET).sum(1).astype(jnp.float32)
        inv = jnp.where(in_deg > 0, 1.0 / jnp.maximum(in_deg, 1.0), 0.0)
        norm = jnp.take(jnp.concatenate([inv, jnp.zeros(1)]),
                        jnp.asarray(batch.senders), mode="clip")

        def loss_naive(p):
            act = jax.nn.relu
            lin = lambda q, v: v @ q["w"] + q["b"]
            x, e = jnp.asarray(batch.node_x), jnp.asarray(batch.edge_attr)
            xs = jnp.take(ext(x), batch.senders, axis=0, mode="clip")
            h0 = act(lin(p["edge_init"], jnp.concatenate([xs, e], 1)))
            h = h0
            for l in range(cfg.depth):
                he = ext(h)
                t = (jnp.take(he, batch.edge_nbr, axis=0, mode="clip").sum(1)
                     * norm[:, None]
                     - jnp.take(he, batch.rev, axis=0, mode="clip"))
                h = act(lin(p["convs"][l], t) + h0)
            s = jnp.take(ext(h), batch.node_inc, axis=0, mode="clip").sum(1)
            s = s * inv[:, None]
            hn = act(lin(p["edge_to_node"], jnp.concatenate([x, s], 1)))
            pool = jnp.take(ext(hn), batch.graph_nodes, axis=0,
                            mode="clip").sum(1)
            pred = lin(p["ffn"], pool)[:, 0]
            return jnp.sum(m * (pred - y) ** 2)

        l1, g1 = jax.value_and_grad(loss_custom)(params)
        l2, g2 = jax.value_and_grad(loss_naive)(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_gelu_parity(self, setup):
        graphs, labels, spec, batch, _, _ = setup
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0), activation="GELU")
        params = init_params(jax.random.PRNGKey(5), cfg)
        preds = np.asarray(apply(params, batch, cfg))
        assert np.isfinite(
            preds[np.asarray(batch.graph_mask) > 0]).all()
        # exact-erf GELU (torch default), not the tanh approximation
        from cgr_mpnn_3d_tpu.models import ACTIVATIONS
        x = jnp.linspace(-3, 3, 7)
        expect = x * 0.5 * (1 + jax.scipy.special.erf(x / np.sqrt(2)))
        np.testing.assert_allclose(np.asarray(ACTIVATIONS["GELU"](x)),
                                   np.asarray(expect), rtol=1e-5)


class TestCheckpointMismatch:
    def test_wrong_shape_rejected(self, setup, tmp_path):
        from cgr_mpnn_3d_tpu.train import (load_checkpoint, restore_into,
                                           save_checkpoint)
        graphs, labels, spec, batch, cfg, params = setup
        save_checkpoint(tmp_path / "c.npz", params, {"model": {}})
        leaves, _ = load_checkpoint(tmp_path / "c.npz")
        other = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                              depth=3, hidden_sizes=(64, 64, 64),
                              dropout_ps=(0.0,) * 3)
        template = init_params(jax.random.PRNGKey(0), other)
        with pytest.raises(ValueError):
            restore_into(template, leaves)
