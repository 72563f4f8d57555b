"""Kernel microbenchmarks: time each hot op against the device's dense-matmul
roofline to see where the step time goes.

  python -m cgr_mpnn_3d_tpu.cli.bench_ops [--graphs N] [--hidden H]

No reference equivalent (the reference has no benchmarks at all,
SURVEY.md §6); this is the perf-engineering loop for the Pallas kernels.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _time(fn, *args, repeats=3, scan_len=16):
    """Scan-based timing: the tunneled axon runtime caches standalone
    jit executions (standalone timings can exceed hardware peak); a
    lax.scan whose carry feeds the next iteration forces real compute."""
    import jax
    import jax.numpy as jnp

    first = args[0]

    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(c, *args[1:])
            # fold the output back into the carry so iterations depend
            tot = sum(jnp.sum(l).astype(jnp.float32)
                      for l in jax.tree_util.tree_leaves(out))
            nxt = jax.tree_util.tree_map(
                lambda a: (a.astype(jnp.float32) * 0.999
                           + 1e-12 * tot).astype(a.dtype), c)
            return nxt, None
        return jax.lax.scan(body, x, None, length=scan_len)[0]

    out = run(first)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(first)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / scan_len)
    return best


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=2500)
    ap.add_argument("--hidden", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ..data import pack_graphs, plan_spec
    from ..data.batch import packs_needed
    from ..data.synthetic import synthetic_graphs
    from ..ops.dispatch import SpmmMeta, build_model_indices, spmm_t
    from ..ops.pallas_fused import FusedConvSpec, fused_conv_layer
    from ..ops.segment import dmpnn_messages

    H = args.hidden
    rng = np.random.default_rng(0)
    graphs = synthetic_graphs(args.graphs, rng)
    spec = plan_spec(graphs, te=512, tn=256, tb=32)
    spec = spec.with_packs(packs_needed(graphs, spec, fill_target=0.92))
    batch = pack_graphs(graphs, [0.0] * len(graphs), spec)
    batch = jax.device_put(batch)
    ET = spec.total_edges
    n_real = sum(g.num_edges for g in graphs)
    print(f"device={jax.devices()[0].device_kind} packs={spec.p} "
          f"ET={ET} real_edges={n_real}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (ET, H), jnp.bfloat16)
    h0 = jax.random.normal(key, (ET, H), jnp.bfloat16)
    w = jax.random.normal(key, (H, H), jnp.float32) * 0.05
    b = jnp.zeros((H,), jnp.float32)
    norm = jnp.ones((ET,), jnp.float32)
    D = batch.edge_nbr.shape[1]
    idxs = build_model_indices(batch, spec.p)
    idxs = jax.tree_util.tree_map(jax.device_put, idxs)
    interp = bool(args.cpu)
    meta = SpmmMeta(D, True, interpret=interp)
    fspec = FusedConvSpec(p=spec.p, d_nbr=D, out_dtype=jnp.bfloat16,
                          interpret=interp)

    results = {}

    # roofline anchor: dense matmul of the same magnitude as one conv layer
    mm = jax.jit(lambda a, bm: a @ bm)
    t = _time(mm, h, w.astype(jnp.bfloat16))
    results["dense_matmul[ET,H]x[H,H]"] = (t, 2 * ET * H * H / t / 1e12)

    f = jax.jit(lambda hh: dmpnn_messages(hh.astype(jnp.float32),
                                          batch.edge_nbr, batch.rev,
                                          batch.edge_nbr_rev, norm))
    results["xla_gather_messages"] = (_time(f, h), None)

    f = jax.jit(lambda hh: spmm_t(spec.p, meta, meta, hh,
                                  idxs.msg_fwd, idxs.msg_bwd))
    results["pallas_onehot_messages"] = (_time(f, h), None)

    f = jax.jit(lambda hh, h0h: fused_conv_layer(
        fspec, hh, h0h, idxs.msg_fwd, w, b,
        jnp.ones(()), jnp.zeros((), jnp.int32)))
    t = _time(f, h, h0)
    fl = 2 * ET * (spec.te * H + H * H)
    results["fused_conv_fwd"] = (t, fl / t / 1e12)

    g = jax.jit(jax.grad(lambda hh, h0h: fused_conv_layer(
        fspec, hh, h0h, idxs.msg_fwd, w, b,
        jnp.ones(()), jnp.zeros((), jnp.int32)).astype(jnp.float32).sum(),
        argnums=(0, 1)))
    t = _time(g, h, h0)
    results["fused_conv_fwd+bwd"] = (t, 3 * fl / t / 1e12)

    # full-model pieces
    import optax
    from ..models import CGRMPNNConfig, apply, init_params
    from ..train import make_optimizer
    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=4, hidden_sizes=(H,) * 4,
                        dropout_ps=(0.0,) * 4,
                        compute_dtype=jnp.bfloat16, use_pallas=True,
                        pallas_interpret=interp)
    params = init_params(key, cfg)

    fwd = jax.jit(lambda p: apply(p, batch, cfg, spec).sum())
    results["model_fwd"] = (_time(fwd, params), None)

    vg = jax.jit(lambda p: jax.value_and_grad(
        lambda q: apply(q, batch, cfg, spec).sum())(p)[0])
    results["model_fwd+bwd"] = (_time(vg, params), None)

    opt = make_optimizer(1e-4, 0.0, 1.0, 100)
    opt_state = opt.init(params)
    grads = jax.jit(jax.grad(lambda q: apply(q, batch, cfg, spec).sum()))(
        params)

    def upd(g, s, p):
        u, s2 = opt.update(g, s, p)
        return optax.apply_updates(p, u)
    results["optimizer_update"] = (_time(jax.jit(upd), grads, opt_state,
                                         params), None)

    from ..ops.dispatch import build_model_indices as bmi
    results["build_indices"] = (_time(jax.jit(lambda b: bmi(b, spec.p)),
                                      batch), None)

    for name, (t, tf) in results.items():
        extra = f"  {tf:.1f} TF/s" if tf else ""
        print(f"{name:32s} {t * 1e3:8.3f} ms{extra}  "
              f"({n_real / t / 1e6:8.1f} Medge/s-equiv)")


if __name__ == "__main__":
    main()
