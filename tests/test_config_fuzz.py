"""Config-space differential fuzz: kernels vs the XLA oracle.

The kernels are general over activation x aggregation x pooling x skip x
sub-packs x depth (README "Config -> compute path").  The parametrized unit
tests cover each axis; this test covers their CROSS-PRODUCT with seeded
random draws so an interaction bug between two axes (e.g. the mean column
scale composing with learnable skip under q=2) cannot hide.  Every draw
checks forward predictions AND all parameter gradients of the one-kernel
train step against jax.value_and_grad over the XLA gather path
(ops/segment.py) in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
from cgr_mpnn_3d_tpu.models.cgr_mpnn import (fused_train_value_and_grad,
                                             supports_fused_train)

SMILES = ["CCO>>CC=O", "CC(=O)N>>CC(=O)N", "C=CC=C>>C=CC=C",
          "CCO>C>CCO", "O>C>CO", "N>C>CN", "CC>>CC",
          "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]",
          "C1CC1>>C=CC", "CCN>>CC=N"]
LABELS = [0.7 * i - 2.0 for i in range(len(SMILES))]


@pytest.fixture(scope="module")
def packed():
    graphs = [RxnGraph(s).arrays for s in SMILES]
    spec = plan_spec(graphs, te=64, tn=32, tb=8).with_packs(2)
    return spec, pack_graphs(graphs, LABELS, spec)


def _draw_cfg(rng):
    depth = int(rng.integers(2, 5))
    return CGRMPNNConfig(
        num_node_features=78, num_edge_features=14, depth=depth,
        hidden_sizes=(int(rng.choice([8, 16, 24])),) * depth,
        dropout_ps=(0.0,) * depth,
        activation=str(rng.choice(["ReLU", "SiLU", "GELU"])),
        aggr=str(rng.choice(["add", "mean"])),
        pooling=str(rng.choice(["add", "mean"])),
        use_learnable_skip=bool(rng.integers(0, 2)))


@pytest.mark.parametrize("seed", range(8))
def test_random_config_forward_and_grads_match_xla(packed, seed):
    spec, batch = packed
    rng = np.random.default_rng(100 + seed)
    cfg_x = _draw_cfg(rng)
    q = int(rng.choice([1, 2]))
    from dataclasses import replace
    cfg_m = replace(cfg_x, use_pallas=True, pallas_interpret=True,
                    pallas_sub_packs=q)
    assert supports_fused_train(cfg_m)

    params = init_params(jax.random.PRNGKey(seed), cfg_x)
    if cfg_x.use_learnable_skip:
        params["skip_weights"] = [
            jnp.asarray(v) for v in rng.uniform(-0.5, 1.5, cfg_x.depth)]

    desc = (f"seed={seed} depth={cfg_x.depth} h={cfg_x.hidden} "
            f"act={cfg_x.activation} aggr={cfg_x.aggr} "
            f"pool={cfg_x.pooling} skip={cfg_x.use_learnable_skip} q={q}")

    # forward
    p_x = np.asarray(apply(params, batch, cfg_x))
    p_m = np.asarray(apply(params, batch, cfg_m, spec))
    mask = np.asarray(batch.graph_mask) > 0
    np.testing.assert_allclose(p_m[mask], p_x[mask], rtol=2e-4, atol=2e-4,
                               err_msg=f"forward: {desc}")

    # one-kernel train step vs autodiff over the XLA path
    y = jnp.asarray(batch.labels)
    m = jnp.asarray(batch.graph_mask)

    def loss(p):
        pred = apply(p, batch, cfg_x)
        return jnp.sum(m * (pred - y) ** 2)

    sse_a, g_a = jax.value_and_grad(loss)(params)
    sse_f, g_f = fused_train_value_and_grad(params, batch, cfg_m, spec,
                                            None)
    np.testing.assert_allclose(float(sse_f), float(sse_a), rtol=2e-4,
                               err_msg=f"sse: {desc}")
    flat_a = jax.tree_util.tree_flatten_with_path(g_a)[0]
    flat_f = jax.tree_util.tree_leaves(g_f)
    assert len(flat_a) == len(flat_f)
    for (path, a), b in zip(flat_a, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"grad {jax.tree_util.keystr(path)}: {desc}")


def test_axes_cover_all_values():
    """The 8 seeds must collectively hit every value of every axis (so a
    green run certifies the whole space, not a lucky corner)."""
    seen = {"act": set(), "aggr": set(), "pool": set(), "skip": set()}
    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        cfg = _draw_cfg(rng)
        int(rng.choice([1, 2]))
        seen["act"].add(cfg.activation)
        seen["aggr"].add(cfg.aggr)
        seen["pool"].add(cfg.pooling)
        seen["skip"].add(cfg.use_learnable_skip)
    assert seen["act"] == {"ReLU", "SiLU", "GELU"}, seen
    assert seen["aggr"] == {"add", "mean"}, seen
    assert seen["pool"] == {"add", "mean"}, seen
    assert seen["skip"] == {True, False}, seen
