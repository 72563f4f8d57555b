"""Async-remote-copy boundary exchange (parallel/rdma_exchange.py).

The RDMA kernel must be a drop-in for ep_pack._ring_exchange: identical
permutation semantics (forward + inverse), identical EP model math, and a
correct autodiff transpose — all checked in Pallas TPU-interpret mode on the
8-virtual-CPU mesh so the first real multi-chip allocation can profile the
kernel immediately (VERDICT r2 #5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.models import init_params
from cgr_mpnn_3d_tpu.parallel import P, make_mesh, pack_shard_edges
from cgr_mpnn_3d_tpu.parallel.ep_pack import _ring_exchange, ep_pack_forward
from cgr_mpnn_3d_tpu.parallel.rdma_exchange import ring_exchange_rdma

from test_ep_pack import chain_graph, make_cfg


def _run_exchange(fn, caps, n_ep, n_dp, tw, h, seed=0):
    """Apply ``fn(local_buf)`` under shard_map on a dp x ep mesh; returns
    the stacked [n_dp*n_ep, TW, H] result."""
    mesh = make_mesh(n_dp=n_dp, n_ep=n_ep,
                     devices=jax.devices()[:n_dp * n_ep])
    rng = np.random.default_rng(seed)
    bufs = rng.normal(size=(n_dp * n_ep, tw, h)).astype(np.float32)

    def per_dev(b):
        return fn(b[0])[None]

    sm = jax.jit(jax.shard_map(per_dev, mesh=mesh,
                               in_specs=(P(("dp", "ep")),),
                               out_specs=P(("dp", "ep")), check_vma=False))
    return np.asarray(sm(bufs)), bufs


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("caps", [(8, 0, 16), (8,), (0, 8, 0, 0, 0, 0, 8)])
def test_rdma_matches_ppermute(caps, inverse):
    n_ep = len(caps) + 1
    n_dp = 8 // n_ep
    tw, h = sum(caps), 24

    ref, _ = _run_exchange(
        lambda b: _ring_exchange(b, caps, "ep", inverse=inverse),
        caps, n_ep, n_dp, tw, h)
    got, _ = _run_exchange(
        lambda b: ring_exchange_rdma(b, caps, "ep", inverse=inverse,
                                     interpret=True),
        caps, n_ep, n_dp, tw, h)
    np.testing.assert_array_equal(got, ref)


def test_rdma_vjp_is_inverse_exchange():
    caps, n_ep, n_dp, tw, h = (8, 0, 16), 4, 2, 24, 16

    def grad_of(fn):
        def per(b):
            def loss(x):
                y = fn(x)
                return jnp.sum(y * y * jnp.arange(tw, dtype=jnp.float32
                                                  )[:, None])
            return jax.grad(loss)(b[0])[None]
        return per

    mesh = make_mesh(n_dp=n_dp, n_ep=n_ep, devices=jax.devices()[:8])
    rng = np.random.default_rng(1)
    bufs = rng.normal(size=(8, tw, h)).astype(np.float32)

    def run(fn):
        sm = jax.jit(jax.shard_map(grad_of(fn), mesh=mesh,
                                   in_specs=(P(("dp", "ep")),),
                                   out_specs=P(("dp", "ep")),
                                   check_vma=False))
        return np.asarray(sm(bufs))

    ref = run(lambda b: _ring_exchange(b, caps, "ep"))
    got = run(lambda b: ring_exchange_rdma(b, caps, "ep", interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_ep_forward_and_grads_with_rdma_exchange():
    """Full EP model (graphs spanning every shard -> non-empty wire) must
    produce bit-identical loss and gradients with the RDMA exchange."""
    rng = np.random.default_rng(5)
    graphs = [chain_graph(60, rng), chain_graph(41, rng), chain_graph(7, rng)]
    labels = [1.0, -2.0, 0.5]
    n_ep = 4
    b, espec = pack_shard_edges(graphs, labels, n_ep, te=32, tn=16)
    assert any(c > 0 for c in espec.caps)  # wire actually exercised
    mesh = make_mesh(n_dp=1, n_ep=n_ep, devices=jax.devices()[:n_ep])
    pspec = jax.tree_util.tree_map(lambda _: P("ep"), b)

    def run(cfg):
        params = init_params(jax.random.PRNGKey(0), cfg)

        def per_dev(bb):
            local = jax.tree_util.tree_map(lambda v: v[0], bb)

            def loss(p):
                sse, _ = ep_pack_forward(p, local, cfg, espec, axis="ep")
                return sse

            l, g = jax.value_and_grad(loss)(params)
            return l, jax.lax.psum(g, "ep")

        sm = jax.jit(jax.shard_map(per_dev, mesh=mesh, in_specs=(pspec,),
                                   out_specs=(P(), P()), check_vma=False))
        return sm(b)

    l_ref, g_ref = run(make_cfg())
    l_got, g_got = run(make_cfg(ep_rdma_exchange=True, pallas_interpret=True))
    np.testing.assert_array_equal(np.asarray(l_got), np.asarray(l_ref))
    for a, r in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))

    # and through the FUSED EP path (fused_conv_layer_r + pooled readout),
    # where the RDMA exchange carries the boundary correction r
    l_f, g_f = run(make_cfg(use_pallas=True, pallas_interpret=True,
                            ep_rdma_exchange=True))
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                               rtol=1e-5)
    for a, r in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)
