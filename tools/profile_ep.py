"""Micro-profile of ep_pack_forward components on the real chip.

Times each hot op of the EP forward in isolation (lax.scan loops, axon-safe)
to attribute the EP@1 vs non-EP gap.  Dev tool, not part of the package API.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from cgr_mpnn_3d_tpu.data.synthetic import synthetic_graphs
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, init_params
from cgr_mpnn_3d_tpu.ops.dispatch import SpmmMeta, spmm_t
from cgr_mpnn_3d_tpu.ops.segment import gather_nodes, node_partial_sum
from cgr_mpnn_3d_tpu.parallel import P, make_mesh, pack_shard_edges
from cgr_mpnn_3d_tpu.parallel.ep_pack import ep_pack_forward

STEPS = 32


def timed(name, fn, operand):
    """ms/iter of ``fn(operand)`` with a dependent scan (axon-safe)."""
    @jax.jit
    def loop(c):
        def body(c, _):
            out = fn(c)
            s = (0.0 * out.astype(jnp.float32).sum()).astype(c.dtype)
            return c + s, ()
        c, _ = jax.lax.scan(body, c, None, length=STEPS)
        return c

    jax.block_until_ready(loop(operand))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(loop(operand))
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best/STEPS*1e3:8.3f} ms/iter", file=sys.stderr)


def main():
    nf = 78 + 192
    rng = np.random.default_rng(0)
    graphs = synthetic_graphs(2500, rng, node_feat_dim=nf)
    graphs.sort(key=lambda g: -g.num_edges)
    b, spec = pack_shard_edges(graphs, [0.0] * len(graphs), 1,
                               te=128, tn=64)
    local = jax.tree_util.tree_map(lambda v: jax.device_put(v[0]), b)
    print(f"spec: p={spec.p}, d={spec.d}, d2={spec.d2}, dn={spec.dn}, "
          f"b={spec.b}, pe={spec.pe}, pn={spec.pn}", file=sys.stderr)
    cfg = CGRMPNNConfig(num_node_features=nf, num_edge_features=14, depth=4,
                        hidden_sizes=(400,) * 4, dropout_ps=(0.0,) * 4,
                        compute_dtype=jnp.bfloat16, use_pallas=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    H = 400
    md = jnp.bfloat16

    def meta(d, sign=False):
        return SpmmMeta(d, sign, md, jnp.float32, False)

    h = jnp.ones((spec.pe, H), jnp.bfloat16)
    a_nodes = jnp.ones((spec.pn, H), jnp.float32)
    hn = jnp.ones((spec.pn, H), jnp.float32)
    x = jnp.ones((spec.pn, nf), jnp.bfloat16)

    timed("spmm_t inc [PE->PN]", lambda hh: spmm_t(
        spec.p, meta(spec.d), meta(1), hh, local.inc_t, local.dst_t), h)
    timed("spmm_t src_gather [PN->PE]", lambda aa: spmm_t(
        spec.p, meta(1), meta(spec.d2), aa.astype(jnp.float32),
        local.send_t, local.out_t), a_nodes)
    timed("XLA node_partial_sum inc", lambda hh: node_partial_sum(
        hh, local.node_inc, local.dst), h)
    timed("XLA gather_nodes src", lambda aa: gather_nodes(
        aa, local.senders, local.node_out), a_nodes)
    timed("pairswap", lambda hh: hh.reshape(-1, 2, H)[:, ::-1].reshape(
        hh.shape), h)
    timed("dense lin [PE,H]x[H,H]", lambda hh: jnp.dot(
        hh, params["convs"][0]["w"].astype(md),
        preferred_element_type=jnp.float32), h)
    timed("edge_init x_src gather [PN->PE,F]", lambda xx: spmm_t(
        spec.p, meta(1), meta(spec.d2), xx.astype(jnp.float32),
        local.send_t, local.out_t), x)
    timed("pool node_partial_sum", lambda nn: node_partial_sum(
        nn, local.graph_nodes, local.node_graph), hn)

    mesh = make_mesh(n_dp=1, n_ep=1, devices=jax.devices()[:1])
    pspec = jax.tree_util.tree_map(lambda _: P("ep"), b)
    stacked = jax.device_put(b)

    def fwd_loss(q):
        loc = jax.tree_util.tree_map(lambda v: v[0], stacked)
        sse, _ = ep_pack_forward(q, loc, cfg, spec, axis="ep")
        return sse

    @jax.jit
    def loop_fwd(pp):
        sm = jax.shard_map(fwd_loss, mesh=mesh, in_specs=(P(),),
                           out_specs=P(), check_vma=False)

        def body(c, _):
            l = sm(c)
            return jax.tree_util.tree_map(
                lambda a: a + (0.0 * l).astype(a.dtype), c), ()
        c, _ = jax.lax.scan(body, pp, None, length=STEPS)
        return c

    @jax.jit
    def loop_vg(pp):
        sm = jax.shard_map(lambda q: jax.value_and_grad(fwd_loss)(q),
                           mesh=mesh, in_specs=(P(),),
                           out_specs=(P(), P()), check_vma=False)

        def body(c, _):
            l, g = sm(c)
            return jax.tree_util.tree_map(
                lambda a, d: a + (0.0 * l + 0.0 * d.sum()).astype(a.dtype),
                c, g), ()
        c, _ = jax.lax.scan(body, pp, None, length=STEPS)
        return c

    for name, loop in [("ep fwd", loop_fwd), ("ep fwd+bwd", loop_vg)]:
        jax.block_until_ready(loop(params))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(loop(params))
            best = min(best, time.time() - t0)
        print(f"{name:34s} {best/STEPS*1e3:8.3f} ms/iter", file=sys.stderr)


def profile_fused():
    """Post-fusion breakdown (run with --fused)."""
    nf = 78 + 192
    rng = np.random.default_rng(0)
    graphs = synthetic_graphs(2500, rng, node_feat_dim=nf)
    graphs.sort(key=lambda g: -g.num_edges)
    b, spec = pack_shard_edges(graphs, [0.0] * len(graphs), 1,
                               te=128, tn=64)
    local = jax.tree_util.tree_map(lambda v: jax.device_put(v[0]), b)
    cfg = CGRMPNNConfig(num_node_features=nf, num_edge_features=14, depth=4,
                        hidden_sizes=(400,) * 4, dropout_ps=(0.0,) * 4,
                        compute_dtype=jnp.bfloat16, use_pallas=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    H = 400
    PE, PN = spec.pe, spec.pn
    md = jnp.bfloat16

    from cgr_mpnn_3d_tpu.ops.pallas_fused import (FusedConvSpec,
                                                  fused_conv_layer)
    from cgr_mpnn_3d_tpu.ops.pallas_glin import (GatherLinearSpec,
                                                 fused_gather_linear,
                                                 fused_gather_linear_r)
    from cgr_mpnn_3d_tpu.ops.pallas_ops import build_idx_t

    ninc_ext = jnp.concatenate(
        [local.node_inc, jnp.full((1, spec.d), PE, jnp.int32)], axis=0)

    def mk_msg_t(h):
        msg = jnp.take(ninc_ext, local.senders, axis=0, mode="clip")
        rev_col = jnp.where(local.senders < PN,
                            jnp.arange(PE, dtype=jnp.int32) ^ 1, PE)
        out = build_idx_t(msg, rev_col, spec.p)
        return out.astype(jnp.int32) + (0 * h[0, 0]).astype(jnp.int32)

    h = jnp.ones((PE, H), jnp.bfloat16)
    hn = jnp.ones((PN, H), jnp.float32)
    x = jnp.ones((PN, nf), jnp.bfloat16)
    timed("msg_t build", mk_msg_t, h)

    msg = jnp.take(ninc_ext, local.senders, axis=0, mode="clip")
    rev_col = jnp.where(local.senders < PN,
                        jnp.arange(PE, dtype=jnp.int32) ^ 1, PE)
    msg_t = jax.device_put(np.asarray(build_idx_t(msg, rev_col, spec.p)))

    fspec = FusedConvSpec(p=spec.p, d_nbr=spec.d, tn=spec.tn,
                          mat_dtype=md, out_dtype=jnp.bfloat16)
    seed = jnp.zeros((), jnp.int32)
    skip = jnp.ones((), jnp.float32)
    wl, bl = params["convs"][0]["w"], params["convs"][0]["b"]
    timed("fused_conv_layer fwd", lambda hh: fused_conv_layer(
        fspec, hh, hh, msg_t, wl, bl, skip, seed), h)

    rspec = GatherLinearSpec(p=spec.p, d_nbr=spec.d, mat_dtype=md,
                             out_dtype=jnp.float32)
    wes = params["edge_to_node"]["w"]
    r_s = jnp.zeros((PN, H), jnp.float32)
    timed("readout glin_r fwd", lambda hh: fused_gather_linear_r(
        rspec, hh, r_s, x, local.inc_t, wes[nf:], wes[:nf],
        params["edge_to_node"]["b"]), h)

    timed("pool ELL fwd", lambda nn: node_partial_sum(
        nn, local.graph_nodes, local.node_graph), hn)

    glspec = GatherLinearSpec(p=spec.p, d_nbr=1, mat_dtype=md,
                              out_dtype=jnp.bfloat16)
    wei = params["edge_init"]["w"]
    timed("edge_init glin fwd", lambda xx: fused_gather_linear(
        glspec, xx, local.edge_attr.astype(md), local.send_t,
        wei[:nf], wei[nf:], params["edge_init"]["b"]), x)


if __name__ == "__main__":
    import sys as _s
    if "--fused" in _s.argv:
        profile_fused()
    else:
        main()
