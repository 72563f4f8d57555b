"""Benchmark: sustained edges/s of the full training step (fwd+bwd+optimizer)
for the flagship depth-4 / hidden-400 CGR-MPNN-3D on one chip.

BASELINE.json metric: "edges/s/chip (MPNN fwd+bwd) at depth-4/hidden-400";
the reference publishes no throughput numbers, so ``vs_baseline`` reports the
fraction of the north-star 1 GEdge/s aggregate target delivered by this one
chip.

Prints exactly one JSON line:
  {"metric": "edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import sys
import time

import numpy as np


def _pad128(v: int) -> int:
    return int(math.ceil(v / 128.0)) * 128


def _padded_model_flops(spec, depth, H, F, Fe, mode: str) -> int:
    """MXU work per step under hardware 128-padding, incl. the one-hot
    scatter/gather matmuls — what the chip actually executes."""
    # MXU pads contraction (k) and lane (n) dims to 128; sublane (m) to 8
    Hp, Fp, Fep = H, F, Fe
    te, tn, tb = spec.te, spec.tn, spec.tb
    mm = lambda m, k, n: 2 * m * _pad128(k) * _pad128(n)
    fwd = (mm(te, tn, Fp)                       # x[src] gather
           + mm(te, Fp, Hp) + mm(te, Fep, Hp)   # edge_init
           + depth * (mm(te, te, Hp)            # one-hot message matmul
                      + mm(te, Hp, Hp))         # conv linear
           + mm(tn, te, Hp)                     # incoming-sum scatter
           + mm(tn, Hp, Hp) + mm(tn, Fp, Hp)    # edge_to_node
           + mm(tb, tn, Hp) + mm(tb, Hp, 128))  # pool + ffn head
    if mode == "inference":
        return fwd * spec.p
    bwd = (mm(tb, Hp, 128) + mm(tb, tn, Hp)            # head + pool bwd
           + 2 * mm(tn, Hp, Hp) + mm(tn, Fp, Hp)       # dws, ds, dwxn
           + mm(te, tn, Hp)                            # g_h gather
           + depth * (2 * mm(te, Hp, Hp)               # dW, dt
                      + mm(te, te, Hp))                # dh message bwd
           + mm(te, Fp, Hp) + mm(te, Fep, Hp))         # dwx, dwe
    return (fwd + bwd) * spec.p


def _useful_flops(n_edges, n_nodes, n_graphs, depth, H, F, Fe,
                  mode: str) -> int:
    """True model math: unpadded dims, scatter/gather/pool at zero cost —
    the honest numerator for MXU-utilization claims."""
    fwd = (n_edges * (2 * (F + Fe) * H + depth * 2 * H * H)
           + n_nodes * 2 * (F + H) * H + n_graphs * 2 * H)
    return fwd if mode == "inference" else 3 * fwd


def _device_matmul_ceiling_tflops(jax, jnp) -> float:
    """Sustained bf16 MXU rate on this chip (large chained matmul)."""
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)

    def body(c, _):
        r = jnp.dot(c, a, preferred_element_type=jnp.float32)
        return r.astype(jnp.bfloat16), ()

    @jax.jit
    def loop(c):
        r, _ = jax.lax.scan(body, c, None, length=32)
        return r

    jax.block_until_ready(loop(a))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(loop(a))
        best = min(best, time.time() - t0)
    return 2 * n * n * n * 32 / best / 1e12


def _bench_parallel(args, graphs, n_edges_real, nf) -> None:
    """--parallel ep|dp: per-chip AND aggregate edges/s + comm bytes/step.

    On the single real TPU chip (--ndev 1) the ep mode measures the
    edge-partitioned code path's overhead vs the non-EP Pallas rate
    (VERDICT r2 #1 done-criterion); on a --cpu --ndev 8 virtual mesh it
    measures relative weak scaling and actual wire volume.
    """
    import jax
    import jax.numpy as jnp

    from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, init_params
    from cgr_mpnn_3d_tpu.parallel import make_mesh
    from cgr_mpnn_3d_tpu.train import TrainState, make_optimizer

    ndev = args.ndev
    if len(jax.devices()) < ndev:
        raise SystemExit(f"--ndev {ndev} but only {len(jax.devices())} "
                         f"devices visible")
    use_pallas = not args.no_pallas and not args.cpu
    cfg = CGRMPNNConfig(
        num_node_features=nf, num_edge_features=14, depth=4,
        hidden_sizes=(args.hidden,) * 4, dropout_ps=(0.0,) * 4,
        activation=args.activation, aggr=args.aggr, pooling=args.pooling,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16"
        else jnp.float32,
        use_pallas=use_pallas, pallas_sub_packs=args.q)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4, 0.0, 1.0, 100)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(1))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    labels = [0.0] * len(graphs)
    H = cfg.hidden

    infer = args.mode == "inference"
    if args.parallel == "dpep":
        from dataclasses import replace

        from cgr_mpnn_3d_tpu.parallel import (make_ep_pack_eval_step,
                                              make_ep_pack_train_step,
                                              pack_shard_edges)
        from cgr_mpnn_3d_tpu.parallel.ep_pack import wire_bytes_per_layer
        n_ep = args.ep_width
        if ndev % n_ep:
            raise SystemExit(f"--ndev {ndev} not divisible by "
                             f"--ep-width {n_ep}")
        n_dp = ndev // n_ep
        groups = [graphs[k::n_dp] for k in range(n_dp)]
        built = [pack_shard_edges(g, [0.0] * len(g), n_ep,
                                  te=args.te, tn=args.tn) for g in groups]
        specs = [s for _, s in built]
        spec = replace(
            specs[0],
            te=max(s.te for s in specs), tn=max(s.tn for s in specs),
            p=max(s.p for s in specs), d=max(s.d for s in specs),
            d2=max(s.d2 for s in specs), dr=max(s.dr for s in specs),
            dn=max(s.dn for s in specs), b=max(s.b for s in specs),
            gp=max(s.gp for s in specs), kg=max(s.kg for s in specs),
            caps=tuple(max(c) for c in zip(*[s.caps for s in specs]))
            if n_ep > 1 else ())
        shards = [pack_shard_edges(g, [0.0] * len(g), n_ep, spec=spec)[0]
                  for g in groups]
        stacked = jax.tree_util.tree_map(lambda *v: np.stack(v, 0), *shards)
        mesh = make_mesh(n_dp=n_dp, n_ep=n_ep, devices=jax.devices()[:ndev])
        if infer:
            ev = make_ep_pack_eval_step(cfg, mesh, spec)

            def step(state, stacked):
                sse, _ = ev(state.params, stacked)
                params = jax.tree_util.tree_map(
                    lambda a: a + (0.0 * sse).astype(a.dtype), state.params)
                return state._replace(params=params), sse
        else:
            step = make_ep_pack_train_step(opt, cfg, mesh, spec)
        fill = n_edges_real / (ndev * spec.pe)
        wire = ((2 * cfg.depth + 1) * wire_bytes_per_layer(spec, H) // 2)
        print(f"dpep: dp={n_dp} x ep={n_ep}, p={spec.p} packs/shard "
              f"(te={spec.te}, tn={spec.tn}), fill {fill:.2f}, "
              f"caps={spec.caps} -> wire {wire/1e6:.3f} MB/step/shard, "
              f"grad psum {n_params * 4 / 1e6:.1f} MB/step",
              file=sys.stderr)
    elif args.parallel == "ep":
        from cgr_mpnn_3d_tpu.parallel import (make_ep_pack_eval_step,
                                              make_ep_pack_train_step,
                                              pack_shard_edges)
        from cgr_mpnn_3d_tpu.parallel.ep_pack import wire_bytes_per_layer
        batch, spec = pack_shard_edges(graphs, labels, ndev,
                                       te=args.te, tn=args.tn)
        if use_pallas and spec.p % args.q:
            # q-sub-pack fusion needs q | p; on real TPU the q x smaller
            # message matmuls outweigh a few empty filler packs (r3 lever
            # table); on the CPU/XLA path empty packs are pure cost
            from dataclasses import replace
            spec = replace(spec, p=-(-spec.p // args.q) * args.q)
            batch, _ = pack_shard_edges(graphs, labels, ndev, spec=spec)
        mesh = make_mesh(n_dp=1, n_ep=ndev, devices=jax.devices()[:ndev])
        if infer:
            ev = make_ep_pack_eval_step(cfg, mesh, spec)

            def step(state, stacked):
                sse, _ = ev(state.params, stacked)
                params = jax.tree_util.tree_map(
                    lambda a: a + (0.0 * sse).astype(a.dtype), state.params)
                return state._replace(params=params), sse
        else:
            step = make_ep_pack_train_step(opt, cfg, mesh, spec)
        stacked = jax.tree_util.tree_map(lambda v: v[None], batch)
        fill = n_edges_real / (ndev * spec.pe)
        # wire volume: push+pull per conv layer + final push (readout), per
        # shard; grads all-reduce once per step
        wire = ((2 * cfg.depth + 1) * wire_bytes_per_layer(spec, H) // 2)
        # weak-scaling diagnosis (VERDICT r3 weak #5): per-shard fill and
        # load spread — every shard executes spec.p packs regardless of how
        # many it actually fills, so min(fill_k) bounds the aggregate
        ek = [int((batch.senders[k] < spec.pn).sum()) for k in range(ndev)]
        fills = [e / spec.pe for e in ek]
        print(f"ep: n_ep={ndev}, p={spec.p} packs/shard "
              f"(te={spec.te}, tn={spec.tn}), fill {fill:.2f} "
              f"(per-shard min {min(fills):.2f} / max {max(fills):.2f}, "
              f"edge load spread {min(ek)}..{max(ek)}), "
              f"caps={spec.caps} -> wire {wire/1e6:.3f} MB/step/shard, "
              f"grad psum {n_params * 4 / 1e6:.1f} MB/step",
              file=sys.stderr)
    else:
        from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
        from cgr_mpnn_3d_tpu.data.batch import packs_needed
        from cgr_mpnn_3d_tpu.parallel import make_dp_train_step
        groups = [graphs[k::ndev] for k in range(ndev)]  # size-balanced
        spec = plan_spec(graphs, te=args.te, tn=args.tn, tb=args.tb)
        p = max(packs_needed(g, spec, fill_target=0.92) for g in groups)
        p = -(-p // args.q) * args.q
        spec = spec.with_packs(p)
        per_dev = [pack_graphs(g, [0.0] * len(g), spec) for g in groups]
        stacked = jax.tree_util.tree_map(
            lambda *v: np.stack(v, 0), *per_dev)
        mesh = make_mesh(n_dp=ndev, n_ep=1, devices=jax.devices()[:ndev])
        if infer:
            from cgr_mpnn_3d_tpu.parallel import make_dp_eval_step
            ev = make_dp_eval_step(cfg, mesh, spec=spec)

            def step(state, stacked):
                sse = ev(state.params, stacked)
                params = jax.tree_util.tree_map(
                    lambda a: a + (0.0 * sse).astype(a.dtype), state.params)
                return state._replace(params=params), sse
        else:
            step = make_dp_train_step(opt, cfg, mesh, spec=spec)
        fill = n_edges_real / (ndev * spec.total_edges)
        wire = 0
        print(f"dp: n_dp={ndev}, p={spec.p} packs/device, fill {fill:.2f}, "
              f"grad psum {n_params * 4 / 1e6:.1f} MB/step",
              file=sys.stderr)

    stacked = jax.device_put(stacked)

    @jax.jit
    def run(state, stacked):
        def body(s, _):
            out = step(s, stacked)
            return out[0], out[1]
        state, losses = jax.lax.scan(body, state, None, length=args.steps)
        return state, losses[-1]

    t0 = time.time()
    lowered = run.lower(state, stacked)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    _, loss = compiled(state, stacked)
    jax.block_until_ready(loss)
    print(f"compile: lower {t_lower:.1f}s + backend {t_compile:.1f}s, "
          f"loss={float(loss):.3g}", file=sys.stderr)

    best = 0.0
    for r in range(args.repeats):
        t0 = time.time()
        _, loss = compiled(state, stacked)
        jax.block_until_ready(loss)
        dt = time.time() - t0
        agg = n_edges_real * args.steps / dt
        print(f"repeat {r}: {dt:.3f}s -> {agg/1e6:.2f} Medges/s aggregate "
              f"({agg/ndev/1e6:.2f} per chip x {ndev})", file=sys.stderr)
        best = max(best, agg)

    prefix = "inference_" if infer else ""
    print(json.dumps({
        "metric": f"{prefix}{args.parallel}_aggregate_edges_per_s",
        "value": round(best, 1),
        "unit": "edges/s",
        "vs_baseline": round(best / 1e9, 4),
        "ndev": ndev,
        "per_chip": round(best / ndev, 1),
        "comm_bytes_per_step_per_shard": int(wire),
        "grad_allreduce_bytes_per_step": int(n_params * 4),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=2500,
                    help="synthetic graphs per batch (~52 edges each)")
    ap.add_argument("--steps", type=int, default=64,
                    help="train steps per timed scan")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--mace-dim", type=int, default=192)
    ap.add_argument("--hidden", type=int, default=400,
                    help="hidden size (400 = reference flagship; 512 = "
                         "TPU-native flagship, fills the 128-lane MXU "
                         "exactly instead of padding 400->512)")
    ap.add_argument("--te", type=int, default=128,
                    help="edge slots per pack (message matmul is O(te) per "
                         "edge -> smaller tiles win until fill drops)")
    ap.add_argument("--tn", type=int, default=72,
                    help="node slots per pack; fill is NODE-bound at "
                         "tn=64 (edge fill 0.94) — 72 recovers 0.97 "
                         "(best-fit packers), measured +1% (r3)")
    ap.add_argument("--tb", type=int, default=8)
    ap.add_argument("--q", type=int, default=4,
                    help="sub-packs fused per kernel grid step: message "
                         "matmuls stay per-pack [te,te] while dense matmuls "
                         "run on [q*te, H] tiles")
    ap.add_argument("--no-pallas", action="store_true",
                    help="use the XLA gather path instead of Pallas kernels")
    ap.add_argument("--no-fused", action="store_true",
                    help="Pallas per-layer kernels but NOT the one-kernel "
                         "train step (cheaper Mosaic compile, more HBM "
                         "traffic)")
    ap.add_argument("--pooling", default="add", choices=["add", "mean"],
                    help="graph pooling (global_add_pool / global_mean_pool)")
    ap.add_argument("--aggr", default="add", choices=["add", "mean"],
                    help="D-MPNN aggregation (kernels are aggregation-"
                         "general: mean folds the 1/deg column scale into "
                         "the in-kernel one-hot matrices)")
    ap.add_argument("-af", "--activation", default="ReLU",
                    choices=["ReLU", "SiLU", "GELU"],
                    help="activation function (kernels are activation-"
                         "general since r4; non-ReLU backward recomputes "
                         "pre-activations in VMEM)")
    ap.add_argument("--mode", default="train",
                    choices=["train", "inference"],
                    help="train = fwd+bwd+optimizer (the headline metric); "
                         "inference = forward only")
    ap.add_argument("--parallel", default="none",
                    choices=["none", "ep", "dp", "dpep"],
                    help="bench a parallel path: ep = edge-partitioned "
                         "train step (pack-local layout + ring exchange), "
                         "dp = data-parallel step, dpep = the combined "
                         "(dp x ep) mesh step the trainer ships; reports "
                         "per-chip AND aggregate edges/s plus comm "
                         "bytes/step")
    ap.add_argument("--ndev", default=1, type=int,
                    help="devices for --parallel (1 on the real chip; up "
                         "to 8 with --cpu for weak-scaling relatives)")
    ap.add_argument("--ep-width", default=2, type=int,
                    help="ep axis width for --parallel dpep "
                         "(dp = ndev / ep-width)")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling for --parallel: multiply --graphs "
                         "by --ndev so per-shard work stays constant "
                         "(otherwise a fixed batch split N ways shrinks "
                         "shards below packing granularity)")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (debug)")
    args = ap.parse_args()

    import os
    if args.cpu and args.ndev > 1:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count"
                                   f"={args.ndev}").strip()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the tunneled-TPU remote compile costs ~45-75s
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
    from cgr_mpnn_3d_tpu.data.synthetic import synthetic_graphs
    from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
    from cgr_mpnn_3d_tpu.train import make_optimizer

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    nf = 78 + args.mace_dim
    rng = np.random.default_rng(0)
    n_graphs = args.graphs * (args.ndev if args.weak else 1)
    graphs = synthetic_graphs(n_graphs, rng, node_feat_dim=nf)
    # first-fit-decreasing: big graphs first -> higher fill, fewer packs
    graphs.sort(key=lambda g: -g.num_edges)
    n_edges_real = sum(g.num_edges for g in graphs)

    if args.parallel != "none":
        _bench_parallel(args, graphs, n_edges_real, nf)
        return

    spec = plan_spec(graphs, te=args.te, tn=args.tn, tb=args.tb)
    from cgr_mpnn_3d_tpu.data.batch import packs_needed
    for fill_target in (0.97, 0.95, 0.92, 0.88, 0.82, 0.75):
        try:
            p = packs_needed(graphs, spec, fill_target=fill_target)
            p = -(-p // args.q) * args.q       # q | p (sub-pack fusion)
            spec = spec.with_packs(p)
            batch = pack_graphs(graphs, [0.0] * len(graphs), spec)
            break
        except ValueError:  # first-fit needs headroom at small tiles
            continue
    else:
        raise SystemExit("could not pack the benchmark batch")
    print(f"batch: {n_edges_real} real edges, {spec.p} packs "
          f"({spec.total_edges} slots, fill "
          f"{n_edges_real / spec.total_edges:.2f})", file=sys.stderr)

    use_pallas = not args.no_pallas and not args.cpu
    cfg = CGRMPNNConfig(
        num_node_features=nf, num_edge_features=14, depth=4,
        hidden_sizes=(args.hidden,) * 4, dropout_ps=(0.0,) * 4,
        activation=args.activation, aggr=args.aggr, pooling=args.pooling,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16"
        else jnp.float32,
        use_pallas=use_pallas, pallas_sub_packs=args.q)
    print(f"pallas: {use_pallas}", file=sys.stderr)

    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4, 0.0, 1.0, 100)
    opt_state = opt.init(params)
    # NOTE: the batch must reach the jitted program as an ARGUMENT, not a
    # closed-over device-array constant: tracing runs concrete-input index
    # ops eagerly, and on a tunneled TPU each becomes a compile+execute
    # round-trip (measured: 252 s of "lowering" in round 2, ~2 s once the
    # batch is a tracer).
    batch = jax.device_put(batch)

    from cgr_mpnn_3d_tpu.models.cgr_mpnn import (fused_train_value_and_grad,
                                                 supports_fused_train)
    use_fused_train = supports_fused_train(cfg) and not args.no_fused
    print(f"fused one-kernel train step: {use_fused_train}", file=sys.stderr)

    def loss_fn(params, batch):
        preds = apply(params, batch, cfg, spec)
        err = (preds - batch.labels) * batch.graph_mask
        return jnp.sum(err * err)

    def one_step(batch, carry, _):
        params, opt_state = carry
        if args.mode == "inference":
            loss = loss_fn(params, batch)
            # fold output into carry so scan iterations stay dependent
            params = jax.tree_util.tree_map(
                lambda a: a + (0.0 * loss).astype(a.dtype), params)
            return (params, opt_state), loss
        if use_fused_train:
            loss, grads = fused_train_value_and_grad(params, batch, cfg,
                                                     spec, None)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run(params, opt_state, batch):
        (params, opt_state), losses = jax.lax.scan(
            functools.partial(one_step, batch), (params, opt_state), None,
            length=args.steps)
        return params, opt_state, losses[-1]

    # compile + warmup, split into trace/lower (local) vs backend compile
    # (XLA+Mosaic, server-side under the axon tunnel) so compile-time
    # regressions can be attributed
    t0 = time.time()
    lowered = run.lower(params, opt_state, batch)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    params2, opt_state2, loss = compiled(params, opt_state, batch)
    jax.block_until_ready(loss)
    print(f"compile: lower {t_lower:.1f}s + backend {t_compile:.1f}s, "
          f"first run {time.time() - t0:.1f}s, loss={float(loss):.3g}",
          file=sys.stderr)
    run = compiled

    best = 0.0
    best_dt = float("inf")
    for r in range(args.repeats):
        t0 = time.time()
        params2, opt_state2, loss = run(params, opt_state, batch)
        jax.block_until_ready(loss)
        dt = time.time() - t0
        eps = n_edges_real * args.steps / dt
        print(f"repeat {r}: {dt:.3f}s -> {eps/1e6:.2f} Medges/s",
              file=sys.stderr)
        best = max(best, eps)
        best_dt = min(best_dt, dt)

    # roofline honesty (VERDICT r1): how much of this is real model math,
    # and how close is the step to the chip's achievable matmul rate
    step_s = best_dt / args.steps
    padded = _padded_model_flops(spec, cfg.depth, cfg.hidden, nf, 14,
                                 args.mode)
    n_nodes_real = sum(g.num_nodes for g in graphs)
    useful = _useful_flops(n_edges_real, n_nodes_real, len(graphs),
                           cfg.depth, cfg.hidden, nf, 14, args.mode)
    ceiling = (_device_matmul_ceiling_tflops(jax, jnp)
               if not args.cpu else float("nan"))
    print(f"roofline: executed(padded+one-hot) {padded/1e12:.2f} TFLOP/step "
          f"-> {padded/step_s/1e12:.1f} TFLOP/s "
          f"({padded/step_s/1e12/ceiling*100:.0f}% of the {ceiling:.0f} "
          f"TFLOP/s sustained matmul ceiling measured on this chip); "
          f"useful model math (unpadded, scatter-free) "
          f"{useful/1e12:.2f} TFLOP/step -> {useful/step_s/1e12:.1f} "
          f"TFLOP/s ({useful/padded*100:.0f}% of executed)",
          file=sys.stderr)

    metric = ("edges_per_s_per_chip" if args.mode == "train"
              else "inference_edges_per_s_per_chip")
    print(json.dumps({
        "metric": metric,
        "value": round(best, 1),
        "unit": "edges/s",
        "vs_baseline": round(best / 1e9, 4),
    }))


if __name__ == "__main__":
    main()
